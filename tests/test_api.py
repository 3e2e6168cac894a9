from pyspark.sql import functions as F

from osm_wikipedia_tag_validator_spark.api import Engine
from osm_wikipedia_tag_validator_spark.datagen import world as W


def test_engine_facade_end_to_end(spark):
    eng = Engine(spark)
    elements = W.spark_elements(spark, 300)
    regions = W.spark_regions(spark)
    wiki = W.spark_wiki_entities(spark)
    catalog = W.spark_error_catalog(spark)
    polygons = W.spark_polygons(spark)

    latest = eng.latest_per_key(elements)
    validated = eng.validate(latest, wiki, regions)
    assert validated.filter(F.col("status") == "error").count() > 0
    reports = eng.error_reports(validated.withColumn("hidden", F.lit(False)), regions)
    assert reports.count() > 0
    rollup = eng.region_rollup(validated, regions, catalog)
    assert rollup.count() > 0
    hits = eng.point_in_polygon(latest.select("id", "lon", "lat"), polygons)
    assert hits.count() > 0
    tiled = eng.assign_tiles(latest.select("id", "lon", "lat"), z=6)
    assert "tile_id" in tiled.columns
