import pytest

from osm_wikipedia_tag_validator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=8, shuffle_partitions=8, app_name="tests")
    yield s
