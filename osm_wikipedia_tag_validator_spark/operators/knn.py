"""kNN nearest-article join — J9/W3 of SURVEY.md §2.

The reference has no explicit kNN; nearest-article matching is implicit
inside its wikibrain detector. The engine provides it as a first-class
operator in two physical strategies:

  * `knn_bruteforce` — broadcast the (small) entity side, JVM-side
    haversine, `row_number` re-rank. Exact; the correctness oracle.
  * `knn_kring` — grid-index candidate generation: each query point
    explodes its k-ring of cells (pandas UDF → array, then `explode`),
    equi-joins entities on cell, re-ranks by distance, and iteratively
    widens the ring for queries that haven't PROVABLY converged: the
    kth neighbor must be nearer than the closest point of the first
    unexplored ring, else the query goes another round. Exactness is
    guaranteed by that ring-distance bound; tests compare against
    brute force.

Ties broken deterministically by (distance, entity_id).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql import types as T

from ..functions import cells as C

EARTH_R_KM = 6371.0088


def haversine_col(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in km as a pure Catalyst expression."""
    p1 = F.radians(lat1)
    p2 = F.radians(lat2)
    dlat = p2 - p1
    dlon = F.radians(lon2) - F.radians(lon1)
    a = F.pow(F.sin(dlat / 2), 2) + F.cos(p1) * F.cos(p2) * F.pow(F.sin(dlon / 2), 2)
    return F.lit(2 * EARTH_R_KM) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def knn_bruteforce(
    queries: DataFrame,
    entities: DataFrame,
    k: int,
    q_key: str = "id",
    e_key: str = "qid",
    q_lon: str = "lon",
    q_lat: str = "lat",
    e_lon: str = "lon",
    e_lat: str = "lat",
) -> DataFrame:
    """Exact kNN via broadcast nested-loop + window re-rank.

    Right plan when |entities| is broadcastable (the wiki-article dim);
    the fact side streams through codegen without shuffling. Output:
    (q_key, e_key, dist_km, rank).
    """
    e = F.broadcast(
        entities.select(
            F.col(e_key).alias("_e_key"),
            F.col(e_lon).alias("_e_lon"),
            F.col(e_lat).alias("_e_lat"),
        )
    )
    q = queries.select(
        F.col(q_key).alias("_q_key"),
        F.col(q_lon).alias("_q_lon"),
        F.col(q_lat).alias("_q_lat"),
    )
    d = q.crossJoin(e).withColumn(
        "dist_km",
        haversine_col(F.col("_q_lon"), F.col("_q_lat"), F.col("_e_lon"), F.col("_e_lat")),
    )
    w = Window.partitionBy("_q_key").orderBy(F.asc("dist_km"), F.asc("_e_key"))
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_q_key").alias(q_key),
            F.col("_e_key").alias(e_key),
            "dist_km",
            "rank",
        )
    )


def _kring_udf(res: int, k: int):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def kring(lon: pd.Series, lat: pd.Series) -> pd.Series:
        cells = C.cell_encode(lon.to_numpy(), lat.to_numpy(), res)
        rings = C.k_ring(cells, k)
        return pd.Series(list(rings))

    return kring


def _ring_min_dist_col(res: int, explored_ring: int, q_lat: Column) -> Column:
    """Per-query lower bound (km) on the distance to any cell NOT yet
    explored (Chebyshev distance > explored_ring). The point sits
    somewhere in its own cell, so the nearest unexplored cell edge is
    ≥ explored_ring cell extents away. Latitude extent is constant on
    this grid; longitude extent shrinks by cos(lat) — take the min via
    the worst latitude the query's own band reaches."""
    cell_deg = 180.0 / (1 << res)
    km_per_deg = 2 * np.pi * EARTH_R_KM / 360.0
    cos_term = F.cos(F.radians(F.least(F.abs(q_lat) + F.lit(cell_deg), F.lit(89.999))))
    shrink = F.least(F.lit(1.0), cos_term)
    return F.lit(float(explored_ring * cell_deg * km_per_deg)) * shrink


def knn_kring(
    queries: DataFrame,
    entities: DataFrame,
    k: int,
    res: int = 6,
    initial_ring: int = 1,
    max_ring: int = 64,
    q_key: str = "id",
    e_key: str = "qid",
    q_lon: str = "lon",
    q_lat: str = "lat",
    e_lon: str = "lon",
    e_lat: str = "lat",
) -> DataFrame:
    """Exact kNN via k-ring candidate equi-join with provable-converged
    escalation. Scales when BOTH sides are big: the join is a cell
    equi-join (shuffle hash / sort-merge on cell), never a cross join.

    Escalation loop runs on the driver over a shrinking query set;
    each round is one Spark job. Rounds grow the ring geometrically.
    """
    spark = queries.sparkSession
    ent = entities.select(
        F.col(e_key).alias("_e_key"),
        F.col(e_lon).alias("_e_lon"),
        F.col(e_lat).alias("_e_lat"),
    ).withColumn("_e_cell", C.cell_col(F.col("_e_lon"), F.col("_e_lat"), res)).cache()
    ent.count()

    remaining = queries.select(
        F.col(q_key).alias("_q_key"),
        F.col(q_lon).alias("_q_lon"),
        F.col(q_lat).alias("_q_lat"),
    )
    results = None
    ring = initial_ring
    while True:
        kr = _kring_udf(res, ring)
        cand = (
            remaining.withColumn("_cells", kr(F.col("_q_lon"), F.col("_q_lat")))
            .withColumn("_e_cell", F.explode(F.array_distinct("_cells")))
            .drop("_cells")
            .join(ent, "_e_cell")
            .dropDuplicates(["_q_key", "_e_key"])
            .withColumn(
                "dist_km",
                haversine_col(
                    F.col("_q_lon"), F.col("_q_lat"), F.col("_e_lon"), F.col("_e_lat")
                ),
            )
        )
        w = Window.partitionBy("_q_key").orderBy(F.asc("dist_km"), F.asc("_e_key"))
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("_q_key", "_q_lon", "_q_lat", "_e_key", "dist_km", "rank")
        )
        # a query is converged iff it found k neighbors AND its kth
        # distance is < the lower bound of the nearest UNEXPLORED cell
        per_q = topk.groupBy("_q_key").agg(
            F.count(F.lit(1)).alias("_n"),
            F.max("dist_km").alias("_kth"),
            F.first("_q_lat").alias("_lat"),
        )
        converged_keys = per_q.filter(
            (F.col("_n") >= k)
            & (F.col("_kth") < _ring_min_dist_col(res, ring, F.col("_lat")))
        ).select("_q_key")
        done = topk.join(converged_keys, "_q_key").select(
            F.col("_q_key").alias(q_key), F.col("_e_key").alias(e_key), "dist_km", "rank"
        )
        results = done if results is None else results.unionByName(done)
        if ring >= max_ring:
            # final round: accept best-effort for stragglers (or none left)
            rest = topk.join(converged_keys, "_q_key", "left_anti").select(
                F.col("_q_key").alias(q_key),
                F.col("_e_key").alias(e_key),
                "dist_km",
                "rank",
            )
            results = results.unionByName(rest)
            break
        n_left = remaining.join(converged_keys, "_q_key", "left_anti").limit(1).count()
        if n_left == 0:
            break
        remaining = remaining.join(converged_keys, "_q_key", "left_anti")
        ring = min(ring * 2, max_ring)
    ent.unpersist()
    return results
