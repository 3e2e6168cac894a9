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
    cand = reports.select("error_id", "osm_object_url")
    challenges = spark.createDataFrame([("wikipedia tag links to 404",)], "error_id string")
    tasks = cand.limit(5).withColumn("status", F.lit("created"))
    plan = eng.challenge_sync_plan(cand, challenges, tasks)
    assert set(plan.select("action").distinct().toPandas()["action"]) <= {
        "create_challenge", "add_task", "delete_task", "flag_manual"
    }


def test_engine_multimodal_surface(spark):
    from osm_wikipedia_tag_validator_spark.datagen import audio as A

    eng = Engine(spark)
    images = W.spark_images(spark, 30)
    feats = eng.image_features(images)
    assert feats.count() == 30
    assert eng.image_neardup(feats).columns == ["id1", "id2", "hamming"]
    assert eng.thumbnails(images, size=8).count() == 30

    videos = W.spark_videos(spark, 5, n_frames=4)
    fr = eng.sample_frames(videos, stride=2)
    assert fr.count() == 10  # 5 clips × frames {0, 2}

    audio = A.spark_audio(spark, 20)
    af = eng.audio_features(audio)
    assert af.count() == 20
    inv = eng.audio_invariants(audio, caption_fn=A.expected_audio_captions)
    assert inv.filter(~inv.samples_exact | ~inv.caption_ok).count() == 0
    assert eng.resample_audio(audio, 8000).count() == 20
