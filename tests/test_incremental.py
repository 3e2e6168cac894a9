import pandas as pd
from pyspark.sql import functions as F

from osm_wikipedia_tag_validator_spark.datagen import world as W
from osm_wikipedia_tag_validator_spark.plans import incremental as INC


def _mini_wiki(spark, q1_exists=True):
    return spark.createDataFrame(
        [
            ("Q1", "en:Good", "en", None, False, q1_exists, "place", 1.0, 1.0, True, {"en": "en:Good"}),
            ("Q2", "en:Other", "en", None, False, True, "place", None, None, False, {"en": "en:Other"}),
        ],
        W.WIKI_SCHEMA,
    )


def _elements(spark, rows):
    return spark.createDataFrame(rows, W.ELEMENTS_SCHEMA)


def test_incremental_round_validates_only_unchecked(spark):
    regions = W.spark_regions(spark)
    wiki = _mini_wiki(spark)
    snap1 = _elements(
        spark,
        [
            ("node", 1, 0.0, -10.0, {"wikidata": "Q1"}, "alpha", 1000, None),
            ("node", 2, 0.0, -10.0, {"wikidata": "banana"}, "alpha", 1000, None),
            ("node", 3, 0.0, -10.0, {"name": "plain"}, "alpha", 1000, None),
        ],
    )
    state = INC.validate_unchecked(INC.initial_state(snap1), wiki, regions)
    pdf = state.toPandas().set_index("id")
    assert pdf.loc[1, "status"] == "clean"
    assert pdf.loc[2, "error_id"] == "malformed wikidata tag"
    assert pdf.loc[3, "status"] == "clean"  # irrelevant row checked-clean

    # delta: node 2 fixed, node 4 new, node 1 untouched (old ts)
    delta = _elements(
        spark,
        [
            ("node", 2, 0.0, -10.0, {"wikidata": "Q1"}, "alpha", 2000, None),
            ("node", 4, 0.0, -10.0, {"wikidata": "Q2"}, "alpha", 2000, None),
        ],
    )
    state2 = INC.incremental_round(state, delta, wiki, regions)
    pdf2 = state2.toPandas().set_index("id")
    assert len(pdf2) == 4
    assert pdf2.loc[2, "status"] == "clean"  # re-validated after fix
    assert pdf2.loc[4, "status"] == "clean"
    assert pdf2.loc[1, "status"] == "clean"  # untouched row carried forward
    assert pdf2.loc[2, "download_timestamp"] == 2000  # newest snapshot won


def test_verify_reported_clears_fixed_upstream(spark):
    regions = W.spark_regions(spark)
    snap = _elements(
        spark,
        [("node", 1, 0.0, -10.0, {"wikidata": "Q1"}, "alpha", 1000, None)],
    )
    # first pass: Q1 does not exist → 404 report
    state = INC.validate_unchecked(
        INC.initial_state(snap), _mini_wiki(spark, q1_exists=False), regions
    )
    assert state.toPandas()["error_id"].iloc[0] == "wikidata tag links to 404"
    # wiki refreshed: Q1 exists now → report must clear (V3 semantics)
    state2 = INC.verify_reported(state, _mini_wiki(spark, q1_exists=True), regions)
    pdf = state2.toPandas()
    assert pdf["status"].iloc[0] == "clean"
    assert pdf["error_id"].iloc[0] is None
