"""Mirrors of the reference's own unit-test suite (SURVEY §5).

The reference ships exactly one test file,
`test_osm_editor_bot_for_approved_tasks.py`, with five cases: four
edge cases of `filter_reported_errors` (the bot's approved-class
filter) and one reverse-geocode sanity check
(`test_polish_mountain_is_in_poland`: a known coordinate resolves to
its containing country). This module re-expresses each case over
DataFrames so the parity is auditable test-by-test.
"""

from osm_wikipedia_tag_validator_spark.datagen import world
from osm_wikipedia_tag_validator_spark.operators import spatial_join as SJ
from osm_wikipedia_tag_validator_spark.operators.reports import filter_reported_errors

_SCHEMA = "error_id string, osm_object_url string"


def _errors(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_filter_reported_errors_on_empty_input(spark):
    # reference: filter_reported_errors([], []) == []
    assert filter_reported_errors(_errors(spark, []), []).count() == 0


def test_filter_reported_errors_on_empty_ids(spark):
    # reference: one error, no approved ids -> []
    df = _errors(spark, [("foobar", "https://osm.org/node/1")])
    assert filter_reported_errors(df, []).count() == 0


def test_filter_reported_errors_on_empty_items(spark):
    # reference: no errors, one approved id -> []
    assert filter_reported_errors(_errors(spark, []), ["example_id"]).count() == 0


def test_filter_reported_errors_on_nonempty_return(spark):
    # reference: the approved error passes through unchanged
    df = _errors(spark, [("foobar", "https://osm.org/node/1")])
    got = filter_reported_errors(df, ["foobar"]).collect()
    assert [(r.error_id, r.osm_object_url) for r in got] == [
        ("foobar", "https://osm.org/node/1")
    ]
    # and a non-approved class does not
    assert filter_reported_errors(df, ["other"]).count() == 0


def test_known_point_resolves_to_its_region(spark):
    """The reverse-geocode shape of `test_polish_mountain_is_in_poland`:
    a fixed coordinate inside the alpha region square (and only it)
    must resolve to exactly region 'alpha' via the PIP join — the
    engine's equivalent of Nominatim's point→country lookup."""
    pts = spark.createDataFrame([(1, -10.0, 0.0)], "id long, lon double, lat double")
    got = (
        SJ.point_in_polygon_join(pts, world.spark_polygons(spark))
        .select("region")
        .collect()
    )
    assert [r.region for r in got] == ["alpha"]


def test_point_in_hole_resolves_to_no_region(spark):
    """Counter-case: a point inside gamma's hole is in NO region."""
    pts = spark.createDataFrame([(2, 32.0, 9.5)], "id long, lon double, lat double")
    hits = SJ.point_in_polygon_join(pts, world.spark_polygons(spark))
    assert hits.count() == 0
