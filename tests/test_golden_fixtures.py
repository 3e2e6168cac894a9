"""Golden end-to-end fixture match — the reference's selftest oracle
pattern (`maproulette_challenge_creation.py:399-433`) writ large: the
full flagship pipeline over the deterministic tiny world must reproduce
the frozen report rows EXACTLY (row set, error classes, urls), after
canonical sort. Any change to datagen, the spatial join, or the
validator cascade that alters semantics trips this test.

Regenerate (only for INTENTIONAL semantic changes):
    python tests/fixtures/regen_golden.py
"""

import os

import pandas as pd

from osm_wikipedia_tag_validator_spark.plans import pipeline as P

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_reports_tiny.csv")


def _current(spark) -> pd.DataFrame:
    inputs = P.build_inputs(spark, 300)
    v = P.validated_elements(inputs)
    rep = P.error_reports(v, inputs["regions"])
    pdf = rep.select(
        "area_identifier", "type", "id", "error_id", "osm_object_url"
    ).toPandas()
    return pdf.sort_values(
        ["area_identifier", "osm_object_url", "error_id"]
    ).reset_index(drop=True)


def test_flagship_reports_match_golden(spark):
    got = _current(spark)
    exp = pd.read_csv(FIXTURE)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_golden_covers_many_error_classes(spark):
    exp = pd.read_csv(FIXTURE)
    # the fixture must stay a meaningful oracle: several classes firing
    assert exp["error_id"].nunique() >= 6
    assert len(exp) > 50
