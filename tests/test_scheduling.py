import pytest
from pyspark.sql import functions as F

from osm_wikipedia_tag_validator_spark.datagen import world as W
from osm_wikipedia_tag_validator_spark.plans import scheduling as S


def test_check_region_config_rejects_slash(spark):
    S.check_region_config(W.spark_regions(spark))  # fixture config is valid
    bad = spark.createDataFrame(
        [("a/b", "t", "en", [], [], 1.0, False)], W.REGIONS_SCHEMA
    )
    with pytest.raises(ValueError, match="malformed"):
        S.check_region_config(bad)


def test_region_priority_order(spark):
    regions = W.spark_regions(spark)
    wm = spark.createDataFrame(
        [
            ("alpha", 900),    # age 100 × 1.0 = 100
            ("beta", 950),     # age 50 × 2.0 = 100 → tie, name breaks
            ("gamma", 999),    # age 1 × 1.0 = 1
            ("epsilon", 10),   # hidden → excluded
        ],
        "partition string, watermark_ts long",
    )
    order = S.region_priority(regions, wm, now_ts=1000).toPandas()
    names = order["internal_region_name"].tolist()
    # never-downloaded regions first (inf), then by score desc
    assert set(names[:3]) == {"delta", "zeta-north", "zeta-south"}
    assert "epsilon" not in names
    assert names[3:5] == ["alpha", "beta"]  # tie → name asc
    assert names[-1] == "gamma"
