import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from osm_wikipedia_tag_validator_spark.datagen import world as W
from osm_wikipedia_tag_validator_spark.functions.geometry import haversine_km
from osm_wikipedia_tag_validator_spark.operators import ann as ANN
from osm_wikipedia_tag_validator_spark.operators import knn as KNN


def _dense_entities(spark, n=500):
    """Dense entity cloud so the k-ring index path converges quickly."""
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "qid": np.arange(n, dtype=np.int64),
            "lon": rng.uniform(-20, 40, n),
            "lat": rng.uniform(-10, 30, n),
        }
    )
    return spark.createDataFrame(pdf), pdf


def _queries(spark, n=80):
    rng = np.random.default_rng(12)
    pdf = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "lon": rng.uniform(-20, 40, n),
            "lat": rng.uniform(-10, 30, n),
        }
    )
    return spark.createDataFrame(pdf), pdf


def _numpy_knn(qpdf, epdf, k):
    out = {}
    for _, q in qpdf.iterrows():
        d = haversine_km(
            np.full(len(epdf), q["lon"]), np.full(len(epdf), q["lat"]),
            epdf["lon"].to_numpy(), epdf["lat"].to_numpy(),
        )
        order = np.lexsort((epdf["qid"].to_numpy(), d))[:k]
        out[int(q["id"])] = [int(epdf["qid"].iloc[i]) for i in order]
    return out


def test_knn_bruteforce_matches_numpy(spark):
    ents, epdf = _dense_entities(spark)
    qs, qpdf = _queries(spark)
    got = KNN.knn_bruteforce(qs, ents, k=5, q_key="id", e_key="qid").toPandas()
    exp = _numpy_knn(qpdf, epdf, 5)
    for qid, grp in got.groupby("id"):
        nbrs = grp.sort_values("rank")["qid"].tolist()
        assert nbrs == exp[int(qid)]


def test_knn_kring_exact_on_dense_entities(spark):
    ents, epdf = _dense_entities(spark)
    qs, qpdf = _queries(spark, n=40)
    got = KNN.knn_kring(qs, ents, k=3, q_key="id", e_key="qid").toPandas()
    exp = _numpy_knn(qpdf, epdf, 3)
    assert len(got) == 40 * 3
    for qid, grp in got.groupby("id"):
        assert grp.sort_values("rank")["qid"].tolist() == exp[int(qid)]


def test_knn_kring_handles_polar_queries(spark):
    """Queries near the pole exercise the wall-aware convergence bound."""
    ents, epdf = _dense_entities(spark, n=200)
    qpdf = pd.DataFrame({"id": [0, 1, 2], "lon": [0.0, 100.0, -170.0], "lat": [89.5, -89.5, 88.0]})
    qs = spark.createDataFrame(qpdf)
    got = KNN.knn_kring(qs, ents, k=2, q_key="id", e_key="qid").toPandas()
    exp = _numpy_knn(qpdf, epdf, 2)
    for qid, grp in got.groupby("id"):
        assert grp.sort_values("rank")["qid"].tolist() == exp[int(qid)]


def test_ann_ivf_recall(spark):
    # clustered corpus (mixture of gaussians) — IVF's design setting;
    # on purely isotropic random data inverted lists can't help
    rng = np.random.default_rng(5)
    centers = rng.standard_normal((10, 32)) * 4
    X = np.vstack(
        [centers[i % 10] + rng.standard_normal(32) * 0.5 for i in range(300)]
    ).astype(np.float32)
    rows = [(i, [float(x) for x in X[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 40)
    exact = ANN.cosine_topk_native(q, df, k=5).toPandas()
    approx = ANN.ivf_topk(q, df, k=5, n_centroids=12, nprobe=4).toPandas()
    e = {(int(r.vec_id), int(r.neighbor_id)) for r in exact.itertuples()}
    a = {(int(r.vec_id), int(r.neighbor_id)) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.7, f"IVF recall {recall}"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cosine_topk_blocked_matches_native(spark):
    """Block-partitioned exact top-k == brute force, across block
    boundaries (block_rows far below corpus size forces many blocks on
    both sides)."""
    rng = np.random.default_rng(7)
    X = rng.standard_normal((150, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in X[i]]) for i in range(150)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 40)
    native = ANN.cosine_topk_native(q, df, k=4).toPandas().sort_values(["vec_id", "rank"])
    blocked = (
        ANN.cosine_topk_blocked(q, df, k=4, block_rows=23)
        .toPandas()
        .sort_values(["vec_id", "rank"])
    )
    assert native["neighbor_id"].tolist() == blocked["neighbor_id"].tolist()
    assert np.allclose(
        native["cosine"].to_numpy(), blocked["cosine"].to_numpy(), atol=1e-9
    )


def test_cosine_topk_fast_overlimit_routes_to_blocked(spark):
    """An over-limit corpus must NOT be broadcast or collected whole:
    the fast path's fallback is the cogroup block plan — no
    BroadcastNestedLoopJoin, no broadcast of corpus data — and its
    output is exactly brute force."""
    from osm_wikipedia_tag_validator_spark import session as S

    rng = np.random.default_rng(8)
    X = rng.standard_normal((160, 8)).astype(np.float32)
    rows = [(i, [float(x) for x in X[i]]) for i in range(160)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 25)
    before = dict(S._TRACKED_BROADCASTS)
    out = ANN.cosine_topk_fast(q, df, k=3, max_inline_corpus=50)
    got = out.toPandas().sort_values(["vec_id", "rank"])
    # no full-corpus broadcast happened (the fast path's matrix slot
    # was never written) and the plan carries no broadcast join at all
    assert S._TRACKED_BROADCASTS.get("ann_corpus_matrix") is before.get(
        "ann_corpus_matrix"
    )
    plan = _executed_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapCoGroupsInPandas" in plan
    native = ANN.cosine_topk_native(q, df, k=3).toPandas().sort_values(["vec_id", "rank"])
    assert native["neighbor_id"].tolist() == got["neighbor_id"].tolist()


def test_knn_bruteforce_overlimit_routes_to_blocked(spark):
    """Over-limit entity side: cogroup block plan, no broadcast of the
    entity table, exact results equal to the numpy oracle."""
    ents, epdf = _dense_entities(spark, n=300)
    qs, qpdf = _queries(spark, n=50)
    out = KNN.knn_bruteforce(
        qs, ents, k=5, q_key="id", e_key="qid", max_inline_entities=100
    )
    plan = _executed_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapCoGroupsInPandas" in plan
    got = out.toPandas()
    exp = _numpy_knn(qpdf, epdf, 5)
    assert len(got) == 50 * 5
    for qid, grp in got.groupby("id"):
        assert grp.sort_values("rank")["qid"].tolist() == exp[int(qid)]


def test_cosine_topk_fast_matches_native(spark):
    rng = np.random.default_rng(6)
    X = rng.standard_normal((120, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in X[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") < 30)
    native = ANN.cosine_topk_native(q, df, k=4).toPandas().sort_values(["vec_id", "rank"])
    fast = ANN.cosine_topk_fast(q, df, k=4).toPandas().sort_values(["vec_id", "rank"])
    assert native["neighbor_id"].tolist() == fast["neighbor_id"].tolist()
