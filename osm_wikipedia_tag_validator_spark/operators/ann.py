"""Similarity search over embedding columns (array<float>).

  cosine_topk_native  — exact brute force as pure Catalyst higher-order
                        functions (zip_with/aggregate dot product) +
                        window re-rank. Oracle-matchable in SQL.
  cosine_topk_fast    — exact brute force with the corpus broadcast as
                        one numpy matrix; each Arrow batch of queries
                        does a single matmul + argpartition. The scale
                        path for broadcastable corpora.
  ivf_topk            — IVF (inverted-file) ANN: corpus assigned to
                        nearest of C centroids (k-means on a driver
                        sample); queries probe the top-`nprobe`
                        centroids and search only those lists. Recall
                        measured vs brute force in tests.

All variants break ties by ascending corpus id → deterministic output.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from ..session import tracked_broadcast


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _drop_null_vectors(queries, corpus, q_vec, c_vec):
    """Family-uniform null-vector semantics (one place, four callers):
    a null embedding has no cosine against anything, so such rows can
    never appear in the output — drop them at the boundary. Without
    this, `cosine_topk_native` emitted null-cosine rank rows while the
    numpy paths crashed on np.vstack."""
    return (
        queries.filter(F.col(q_vec).isNotNull()),
        corpus.filter(F.col(c_vec).isNotNull()),
    )


def cosine_topk_native(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors, broadcast nested loop, JVM expressions.

    Null-vector rows are dropped on both sides (uniform across the
    whole family — fast/blocked/ivf route through the same
    `_drop_null_vectors` boundary)."""
    queries, corpus = _drop_null_vectors(queries, corpus, q_vec, c_vec)
    q = queries.select(F.col(q_id).alias("qid"), _as_double(q_vec).alias("qv"))
    c = F.broadcast(corpus.select(F.col(c_id).alias("cid"), _as_double(c_vec).alias("cv")))
    dot = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    nq = F.sqrt(F.aggregate(F.zip_with("qv", "qv", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x))
    nc = F.sqrt(F.aggregate(F.zip_with("cv", "cv", lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x))
    d = q.crossJoin(c)
    if exclude_self:
        d = d.filter(F.col("qid") != F.col("cid"))
    d = d.withColumn("cosine", F.round(dot / (nq * nc), 6))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias(q_id), F.col("cid").alias("neighbor_id"), "cosine", "rank")
    )


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], M[order]


def cosine_topk_fast(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    exclude_self: bool = True,
    max_inline_corpus: int = 2_000_000,
    max_inline_bytes: int = 512 * 2**20,
) -> DataFrame:
    """Exact top-k with the corpus as a broadcast numpy matrix: one
    matmul per Arrow batch; the fact side streams, nothing shuffles.
    The matrix ships via SparkContext.broadcast — once per executor,
    not once per task as a closure would.

    Guard convention (shared with ``knn.knn_bruteforce``): count-guard
    BEFORE any driver pull. The inline budget is BYTES, not rows — the
    driver cost of a corpus matrix is rows × dim × 8 B, so a row cap
    alone is dimension-blind (2M rows of 128-d float64 ≈ 2 GB, nothing
    like knn's ~50 MB at the same row count). A bounded probe (max
    size over the first 64 rows) reads the vector width, the row
    budget becomes
    min(max_inline_corpus, max_inline_bytes // (dim × 8)), and a
    limit(budget+1).count() decides the path — the count short-circuits
    after budget+1 rows and pulls no data to the driver. This costs one
    bounded extra lineage evaluation vs the old collect-once-and-discard
    approach; chosen because the failure mode it removes (a multi-GB
    driver materialization thrown away on overflow) is catastrophic
    while the cost it adds is a truncated scan.

    On overflow: `cosine_topk_blocked` — block-partitioned exact top-k
    with NO driver collect and NO full-corpus broadcast — same output,
    same tie-breaks."""
    queries, corpus = _drop_null_vectors(queries, corpus, q_vec, c_vec)
    out_schema = f"{q_id} long, neighbor_id long, cosine double, rank int"
    # ONE guard job (round-5 verdict: the separate 64-row width-probe
    # collect + overflow count cost two driver jobs per call — 0.32 s →
    # 0.42 s on the bench query). The size projection is pushed below
    # the limit, so only ints flow: count and max width come out of the
    # same bounded scan, which short-circuits after max_inline_corpus+1
    # rows and pulls one row to the driver. The width max now covers
    # the WHOLE probed window (not just 64 rows), so a corpus whose
    # wide rows hide past row 64 can no longer under-budget the inline
    # collect. Overflow logic is unchanged: n is capped at
    # max_inline_corpus+1 ≥ row_budget+1, so n > row_budget still
    # fires exactly when the true count exceeds the byte-derived budget.
    probe = (
        corpus.select(F.size(F.col(c_vec)).alias("d"))
        .limit(max_inline_corpus + 1)
        .agg(F.count(F.lit(1)).alias("n"), F.max("d").alias("dmax"))
        .first()
    )
    if not probe["n"]:
        # corpus empty after the null drop: no row can rank against
        # anything — return the empty result the native/blocked twins
        # produce instead of feeding np.vstack an empty array
        return queries.sparkSession.createDataFrame([], out_schema)
    # clamp: an all-empty-array window reads dmax=0 — budget on dim 1
    # rather than dividing by zero (round-5 advice)
    dim = max(1, int(probe["dmax"]))
    row_budget = min(max_inline_corpus, max(1, max_inline_bytes // (dim * 8)))
    if probe["n"] > row_budget:
        return cosine_topk_blocked(
            queries, corpus, k,
            q_id=q_id, q_vec=q_vec, c_id=c_id, c_vec=c_vec,
            exclude_self=exclude_self,
            # block size bounds TASK memory, not driver memory — cap it
            # well under the driver-collect guard
            block_rows=min(row_budget, 65536),
        )
    # limit() keeps the transfer hard-bounded even if the lineage is
    # nondeterministic and grew between the count job and this one
    ids, M = _collect_matrix(corpus.limit(row_budget), c_id, c_vec)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    bc = tracked_broadcast(
        queries.sparkSession.sparkContext, (ids, Mn), "ann_corpus_matrix"
    )

    def topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, Mn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.vstack(pdf[q_vec].to_numpy()).astype(np.float64)
            Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
            # round to 6 before ranking so tie-breaks (rounded cosine
            # desc, id asc) match the native HOF twin and the SQL oracle
            S = np.round(Qn @ Mn.T, 6)  # (batch, corpus)
            qids = pdf[q_id].to_numpy()
            if exclude_self:
                for r, qid in enumerate(qids):
                    hit = np.searchsorted(ids, qid)
                    if hit < len(ids) and ids[hit] == qid:
                        S[r, hit] = -np.inf
            kk = min(k, S.shape[1])
            # argpartition then exact sort of the head; ties → smaller id
            part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            rows = {q_id: [], "neighbor_id": [], "cosine": [], "rank": []}
            for r in range(len(qids)):
                cand = part[r]
                order = np.lexsort((ids[cand], -S[r, cand]))
                sel = cand[order]
                rows[q_id].extend([qids[r]] * kk)
                rows["neighbor_id"].extend(ids[sel])
                rows["cosine"].extend(np.round(S[r, sel], 6))
                rows["rank"].extend(range(1, kk + 1))
            yield pd.DataFrame(rows)

    return queries.select(q_id, q_vec).mapInPandas(topk, out_schema)


def cosine_topk_blocked(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    exclude_self: bool = True,
    block_rows: int = 65536,
) -> DataFrame:
    """Exact top-k for corpora too large to broadcast or collect:
    block nested loop as a cogroup.

    Both sides are hash-blocked (xxhash64(id) % n_blocks — deterministic,
    uniform), each side replicated across the OTHER side's block ids, and
    every (qblock, cblock) pair meets exactly once in a
    ``cogroup().applyInPandas`` task that computes a bounded matmul and
    emits a per-query LOCAL top-k. A window over qid then merges block
    candidates into the global top-k — exact, because each block's local
    top-k is a superset of that block's contribution to the global
    answer. Nothing is collected to the driver and no full-corpus
    broadcast exists; shuffle volume is the textbook block-nested-loop
    n_qblocks·|C| + n_cblocks·|Q|, which is the honest cost of EXACT
    search at scale (the sublinear path is `ivf_topk`).

    Per-task memory is one query block + one corpus block + a
    chunk×block score matrix (queries are chunked inside the task so the
    scores stay ≤ ~256 MB regardless of `block_rows`).

    Same rounding (6 dp before ranking) and tie-breaks (cosine desc,
    cid asc) as `cosine_topk_fast`/`cosine_topk_native` — byte-identical
    output."""
    queries, corpus = _drop_null_vectors(queries, corpus, q_vec, c_vec)
    n_c = corpus.count()
    n_q = queries.count()
    n_cblk = max(1, -(-n_c // block_rows))
    n_qblk = max(1, -(-n_q // block_rows))

    qt = queries.schema[q_id].dataType.simpleString()
    ct = corpus.schema[c_id].dataType.simpleString()

    qb = queries.select(
        F.col(q_id).alias("qid"), _as_double(q_vec).alias("qv")
    ).withColumn("qblk", F.pmod(F.xxhash64("qid"), F.lit(n_qblk)).cast("int"))
    cb = corpus.select(
        F.col(c_id).alias("cid"), _as_double(c_vec).alias("cv")
    ).withColumn("cblk", F.pmod(F.xxhash64("cid"), F.lit(n_cblk)).cast("int"))

    # replicate each side across the other's block ids with a narrow
    # explode (no join node, no broadcast) so cogroup keys cover the
    # full cross of block pairs
    qrep = qb.withColumn(
        "cblk",
        F.explode(F.sequence(F.lit(0).cast("int"), F.lit(n_cblk - 1).cast("int"))),
    )
    crep = cb.withColumn(
        "qblk",
        F.explode(F.sequence(F.lit(0).cast("int"), F.lit(n_qblk - 1).cast("int"))),
    )

    score_budget = 32 * 1024 * 1024  # float64 cells ≈ 256 MB

    def local_topk(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"qid": [], "cid": [], "cosine": []})
        M = np.vstack(right["cv"].to_numpy()).astype(np.float64)
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        cids = right["cid"].to_numpy()
        qids = left["qid"].to_numpy()
        Q = np.vstack(left["qv"].to_numpy()).astype(np.float64)
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
        kk = min(k, len(cids))
        cid_pos = {v: i for i, v in enumerate(cids)} if exclude_self else None
        chunk = max(1, score_budget // max(1, len(cids)))
        out_q, out_c, out_s = [], [], []
        for lo in range(0, len(qids), chunk):
            hi = min(lo + chunk, len(qids))
            S = np.round(Qn[lo:hi] @ Mn.T, 6)
            if exclude_self:
                for r in range(lo, hi):
                    p = cid_pos.get(qids[r])
                    if p is not None:
                        S[r - lo, p] = -np.inf
            part = (
                np.argpartition(-S, kk - 1, axis=1)[:, :kk]
                if kk < S.shape[1]
                else np.tile(np.arange(S.shape[1]), (S.shape[0], 1))
            )
            for r in range(hi - lo):
                cand = part[r]
                order = np.lexsort((cids[cand], -S[r, cand]))
                sel = cand[order]
                keep = S[r, sel] > -np.inf
                sel = sel[keep]
                out_q.extend([qids[lo + r]] * len(sel))
                out_c.extend(cids[sel])
                out_s.extend(S[r, sel])
        return pd.DataFrame({"qid": out_q, "cid": out_c, "cosine": out_s})

    local = (
        qrep.groupBy("qblk", "cblk")
        .cogroup(crep.groupBy("qblk", "cblk"))
        .applyInPandas(local_topk, f"qid {qt}, cid {ct}, cosine double")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias(q_id), F.col("cid").alias("neighbor_id"), "cosine", "rank")
    )


def kmeans_centroids(
    corpus: DataFrame, n_centroids: int, vec_col: str = "embedding",
    sample: int = 4096, iters: int = 8, seed: int = 7,
    order_col: str | None = None,
) -> np.ndarray:
    """Lloyd's k-means on a driver-side sample (numpy). Centroid count
    ~ sqrt(corpus) is the usual IVF sizing. With `order_col` the sample
    is the TakeOrdered head (deterministic across runs/partitionings, so
    the whole IVF output is golden-pinnable); without it, `limit` takes
    whatever rows arrive first — cheaper, order-dependent.

    Driver cost budget: the pull is `sample` rows (sample × dim × 8 B —
    4096 × 128-d ≈ 4 MB) and each Lloyd iteration materializes an
    O(sample × n_centroids × dim) broadcasted difference tensor
    (4096 × 16 × 128 ≈ 64 MB transient at the defaults). Both scale
    linearly in the caller's `sample`/`n_centroids` arguments, NOT in
    corpus size — raising them far above the defaults (e.g. sample 1M)
    moves the work to the driver and needs the pairwise loop rewritten
    as chunked ||x||²+||c||²-2xCᵀ; at IVF's sizing (sample ≈ 256 ×
    sqrt(n) centroids, centroids ≤ ~4k) the budget holds."""
    base = corpus.orderBy(order_col) if order_col else corpus
    pdf = base.select(vec_col).limit(sample).toPandas()
    if len(pdf) == 0:
        # empty corpus: no centroids (np.vstack needs ≥1 array);
        # callers check len() == 0 and short-circuit
        return np.zeros((0, 0))
    X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """IVF ANN: shuffle the corpus once on its centroid list id, then
    probe `nprobe` lists per query via an equi-join on list id — the
    cross join never materializes. Approximate (recall < 1 when the
    true neighbor lives in an unprobed list)."""
    queries, corpus = _drop_null_vectors(queries, corpus, q_vec, c_vec)
    spark = queries.sparkSession
    C = kmeans_centroids(corpus, n_centroids, c_vec, order_col=c_id)
    if len(C) == 0:
        # corpus empty after the null drop — no lists exist; return the
        # empty result the exact twins produce (kmeans' sample pull is
        # the existence probe, no extra job)
        return spark.createDataFrame(
            [], f"{q_id} long, neighbor_id long, cosine double, rank int"
        )
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    def assign_lists(nprobe_n: int, id_name: str, vec_name: str):
        out_schema = f"{id_name} long, list_id int, vec array<double>"

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.vstack(pdf[vec_name].to_numpy()).astype(np.float64)
                Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
                S = Xn @ Cn.T
                # top-nprobe lists form a set (dedup downstream) — an
                # O(C) argpartition suffices, no full sort of centroids
                nn = min(nprobe_n, S.shape[1])
                top = np.argpartition(-S, nn - 1, axis=1)[:, :nn]
                ids = pdf[id_name].to_numpy()
                # flat replication, no per-row Python loop: each input
                # row emits its nn probed lists with the same vec handle
                yield pd.DataFrame(
                    {
                        id_name: np.repeat(ids, nn),
                        "list_id": top.astype(np.int32).ravel(),
                        "vec": list(Xn[np.repeat(np.arange(len(ids)), nn)]),
                    }
                )

        return gen, out_schema

    cg, _ = assign_lists(1, "cid", c_vec)
    corpus_lists = corpus.select(F.col(c_id).alias("cid"), c_vec).mapInPandas(
        cg, "cid long, list_id int, vec array<double>"
    )
    qg, _ = assign_lists(nprobe, "qid", q_vec)
    query_lists = queries.select(F.col(q_id).alias("qid"), q_vec).mapInPandas(
        qg, "qid long, list_id int, vec array<double>"
    )

    # per-list scoring as a cogroup: each probed list meets its corpus
    # list in ONE applyInPandas task that scores every (query, corpus)
    # pair in that list. Replaces the equi-join + per-row higher-order
    # fold (measured ~0.9 s of interpreted lambda evaluation at sf1.0)
    # AND the 128-doubles-per-pair join output: vectors cross Arrow
    # once per side, the task emits only (qid, cid, dot). The dot is
    # accumulated COLUMN BY COLUMN (acc += q_i·c_i, i ascending), which
    # replays the zip_with/aggregate left fold's exact double-rounding
    # sequence — emitted values are bit-identical to the HOF path, and
    # the final rounding stays in Spark (same F.round as before).
    def score_list(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame({"qid": [], "cid": [], "dot": []})
        Q = np.vstack(left["vec"].to_numpy())
        Cm = np.vstack(right["vec"].to_numpy())
        acc = np.zeros((len(Q), len(Cm)))
        for i in range(Q.shape[1]):
            acc += Q[:, i, None] * Cm[None, :, i]
        qids = left["qid"].to_numpy()
        cids = right["cid"].to_numpy()
        keep = qids[:, None] != cids[None, :]
        qi, ci = np.nonzero(keep)
        return pd.DataFrame({"qid": qids[qi], "cid": cids[ci], "dot": acc[qi, ci]})

    j = (
        query_lists.groupBy("list_id")
        .cogroup(corpus_lists.groupBy("list_id"))
        .applyInPandas(score_list, "qid long, cid long, dot double")
        .withColumn("cosine", F.round(F.col("dot"), 6))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        j.select("qid", "cid", "cosine")
        .dropDuplicates(["qid", "cid"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias(q_id), F.col("cid").alias("neighbor_id"), "cosine", "rank")
    )
