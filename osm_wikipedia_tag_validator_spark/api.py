"""User-facing facade — the one-import surface a reference user
switches to.

    from osm_wikipedia_tag_validator_spark.api import Engine

    eng = Engine(spark)
    state    = eng.validate(elements, wiki, regions)      # V1/J1/J5
    reports  = eng.error_reports(state, regions)          # S8 rows
    rollup   = eng.region_rollup(state, regions, catalog) # A1/J8
    tiles    = eng.assign_tiles(images_located, z=8)      # tiling
    contained= eng.point_in_polygon(points, polygons)     # J5
    nn       = eng.knn(points, articles, k=5)             # J9
    state2   = eng.incremental_round(state, delta, wiki, regions)

Every method returns a DataFrame (lazy); nothing collects. The class
holds no state beyond the session — it's organizational sugar over the
operator modules, which remain directly importable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .operators import ann as _ann
from .operators import dedup as _dedup
from .operators import knn as _knn
from .operators import spatial_join as _sj
from .operators import tiles as _tiles
from .operators import upsert as _upsert
from .operators import validator as _validator
from .plans import incremental as _inc
from .plans import pipeline as _pipe


class Engine:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    # --- spatial ---
    def point_in_polygon(self, points, polygons, **kw) -> DataFrame:
        return _sj.point_in_polygon_join(points, polygons, **kw)

    def all_points_inside(self, objects, polygons, **kw) -> DataFrame:
        return _sj.all_points_inside(objects, polygons, **kw)

    def assign_tiles(self, df, z: int, **kw) -> DataFrame:
        return _tiles.assign_tiles(df, z, **kw)

    def tile_vector_assignment(self, points, polygons, z: int, **kw) -> DataFrame:
        return _tiles.tile_vector_assignment(points, polygons, z, **kw)

    def knn(self, queries, entities, k: int, **kw) -> DataFrame:
        return _knn.knn_kring(queries, entities, k, **kw)

    def knn_exact(self, queries, entities, k: int, **kw) -> DataFrame:
        return _knn.knn_bruteforce(queries, entities, k, **kw)

    # --- validation ---
    def validate(self, elements, wiki, regions, **kw) -> DataFrame:
        return _validator.validate(elements, wiki, regions, **kw)

    def incremental_round(self, state, delta, wiki, regions) -> DataFrame:
        return _inc.incremental_round(state, delta, wiki, regions)

    def error_reports(self, validated, regions) -> DataFrame:
        return _pipe.error_reports(validated, regions)

    def region_rollup(self, validated, regions, error_catalog) -> DataFrame:
        return _pipe.region_rollup(validated, regions, error_catalog)

    def materialize(self, outputs: dict[str, DataFrame], action=None) -> dict:
        """Materialize independent sink DataFrames with concurrently
        submitted jobs (one driver thread per sink). `action(name, df)`
        defaults to counting; pass a writer to land real sinks — see
        plans/pipeline.py::materialize_concurrently."""
        return _pipe.materialize_concurrently(outputs, action)

    def sync_tasks(self, current_reports, existing_tasks, **kw):
        from .operators import reports as _rep

        return _rep.sync_tasks(current_reports, existing_tasks, **kw)

    def featured_rotation(self, tasks, featured_pool, **kw) -> DataFrame:
        from .operators import reports as _rep

        return _rep.featured_rotation(tasks, featured_pool, **kw)

    def challenge_sync_plan(self, candidates, challenges, mr_tasks) -> DataFrame:
        from .operators import reports as _rep

        return _rep.challenge_sync_plan(candidates, challenges, mr_tasks)

    # --- state ---
    def latest_per_key(self, df, **kw) -> DataFrame:
        return _upsert.latest_per_key(df, **kw)

    def merge_upsert(self, base, delta, **kw) -> DataFrame:
        return _upsert.merge_upsert(base, delta, **kw)

    # --- training-data ops ---
    def exact_dedup(self, df, **kw) -> DataFrame:
        return _dedup.exact_dedup(df, **kw)

    def minhash_neardup(self, df, **kw) -> DataFrame:
        return _dedup.minhash_lsh_pairs(df, **kw)

    def simhash_neardup(self, df, **kw) -> DataFrame:
        return _dedup.simhash_pairs(df, **kw)

    def embedding_neardup(self, df, **kw) -> DataFrame:
        return _dedup.embedding_neardup_pairs(df, **kw)

    def similarity_topk(self, queries, corpus, k: int, approximate: bool = False, **kw) -> DataFrame:
        if approximate:
            return _ann.ivf_topk(queries, corpus, k, **kw)
        return _ann.cosine_topk_fast(queries, corpus, k, **kw)

    # --- multimodal columns (image / audio / video over binary bytes) ---
    def image_features(self, images, **kw) -> DataFrame:
        from .operators import images_ops as _img

        return _img.extract_features(images, **kw)

    def image_invariants(self, images, **kw) -> DataFrame:
        from .operators import images_ops as _img

        return _img.verify_invariants(images, **kw)

    def image_neardup(self, features, **kw) -> DataFrame:
        from .operators import images_ops as _img

        return _img.neardup_by_phash(features, **kw)

    def thumbnails(self, images, **kw) -> DataFrame:
        from .operators import images_ops as _img

        return _img.make_thumbnails(images, **kw)

    def sample_frames(self, videos, **kw) -> DataFrame:
        from .operators import images_ops as _img

        return _img.sample_frames(videos, **kw)

    def audio_features(self, audio, **kw) -> DataFrame:
        from .operators import audio_ops as _aud

        return _aud.extract_features(audio, **kw)

    def audio_invariants(self, audio, **kw) -> DataFrame:
        from .operators import audio_ops as _aud

        return _aud.verify_invariants(audio, **kw)

    def audio_neardup(self, audio, **kw) -> DataFrame:
        from .operators import audio_ops as _aud

        return _aud.neardup_by_fingerprint(audio, **kw)

    def resample_audio(self, audio, target_sr: int, **kw) -> DataFrame:
        from .operators import audio_ops as _aud

        return _aud.resample_audio(audio, target_sr, **kw)
