"""The correctness-gate query surface.

One entry per implemented operator family from SURVEY.md §2, each as a
(spark, sf_dir) → DataFrame callable plus (where SQL-expressible) an
ANSI-SQL oracle DuckDB runs on the same parquet views. Column names are
aliased identically on both sides; floats are rounded to 6 decimals;
counts cast to bigint.

Spatial queries derive deterministic lon/lat from table keys (odd/200
degrees — provably never on a dyadic cell boundary) so the cell/tile
encodings are exactly reproducible in portable SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import cells as C
from ..functions import textfns as TX
from ..operators import ann as ANN
from ..operators import dedup as DD
from ..operators import knn as KNN
from ..operators import spatial_join as SJ
from ..operators import tiles as TI
from ..operators import upsert as UP

# ---------------------------------------------------------------------------
# shared derivations
# ---------------------------------------------------------------------------

_LON = "((c_custkey * 7919) % 36000) / 100.0 - 180.0 + 0.005"
_LAT = "((c_custkey * 104729) % 17000) / 100.0 - 85.0 + 0.005"
_S_LON = "((s_suppkey * 7919) % 36000) / 100.0 - 180.0 + 0.005"
_S_LAT = "((s_suppkey * 104729) % 17000) / 100.0 - 85.0 + 0.005"

CELL_RES = 7
TILE_Z = 6


def _pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return cust.select(
        "c_custkey",
        (((F.col("c_custkey") * 7919) % 36000) / 100.0 - 180.0 + 0.005).alias("lon"),
        (((F.col("c_custkey") * 104729) % 17000) / 100.0 - 85.0 + 0.005).alias("lat"),
    )


def _supplier_pts(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return sup.select(
        "s_suppkey",
        (((F.col("s_suppkey") * 7919) % 36000) / 100.0 - 180.0 + 0.005).alias("lon"),
        (((F.col("s_suppkey") * 104729) % 17000) / 100.0 - 85.0 + 0.005).alias("lat"),
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# relational operators (SURVEY §2.2/2.3/2.4/2.5/2.6/2.7)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    """A1/A2-style hash aggregation with map-side partials (free in Spark)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_latest_order_per_customer(spark, sf_dir):
    """W1 latest-row-per-key dedup (`load_osm_file.py:27-40`)."""
    o = _t(spark, sf_dir, "orders")
    latest = UP.latest_per_key(
        o.withColumn("_ts", F.unix_timestamp("o_orderdate") * 1000 + F.col("o_orderkey") % 1000),
        key_cols=["o_custkey"],
        ts_col="_ts",
    )
    return latest.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
    )


SQL_LATEST_ORDER = """
SELECT o_custkey, o_orderkey, STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY o_custkey
      ORDER BY (EPOCH(o_orderdate)*1000 + o_orderkey % 1000) DESC) AS rn
  FROM orders
) WHERE rn = 1
"""


def q_top_stalest(spark, sf_dir):
    """W2/O1: global top-K by staleness (`script.py:73-76` LIMIT 10) —
    TakeOrderedAndProject, no full sort."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
    )


SQL_TOP_STALEST = """
SELECT o_orderkey, STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate
FROM orders ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 10
"""


def q_argmax_acctbal(spark, sf_dir):
    """A4/O4 argmax per group (`database.py:52-59` ORDER BY DESC LIMIT 1)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


SQL_ARGMAX = """
SELECT c_nationkey, c_custkey, ROUND(c_acctbal, 2) AS acctbal
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
  FROM customer
) WHERE rn = 1
"""


def q_broadcast_join_revenue(spark, sf_dir):
    """J1 equi-join with explicit broadcast of the small dim."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_BROADCAST_JOIN = """
SELECT p_brand, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_anti_join_customers(spark, sf_dir):
    """J7 anti-join (MapRoulette two-way sync,
    `maproulette_challenge_creation.py:642-681`)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_universal_quantifier(spark, sf_dir):
    """J6 all-members-pass semi-join (`osm_editor_bot…py:188-196`):
    orders where EVERY lineitem has discount < 0.05 → bool_and via min."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.min((F.col("l_discount") < 0.05).cast("int")).alias("_all"))
        .filter(F.col("_all") == 1)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )


SQL_UNIVERSAL = """
SELECT l_orderkey AS o_orderkey FROM lineitem
GROUP BY l_orderkey HAVING MIN(CASE WHEN l_discount < 0.05 THEN 1 ELSE 0 END) = 1
"""


def q_rollup_merged(spark, sf_dir):
    """J8/A1 two-level rollup (region ⊃ nation), mirroring merged-region
    report rollups (`generate_webpage_with_error_output.py:1180-1258`)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    base = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    per_nation = base.groupBy(F.col("n_name").alias("group_name")).agg(
        F.count(F.lit(1)).alias("n_customers")
    ).withColumn("level", F.lit("nation"))
    per_region = base.groupBy(F.col("r_name").alias("group_name")).agg(
        F.count(F.lit(1)).alias("n_customers")
    ).withColumn("level", F.lit("region"))
    return per_nation.unionByName(per_region)


SQL_ROLLUP = """
WITH base AS (
  SELECT n_name, r_name FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
)
SELECT n_name AS group_name, CAST(COUNT(*) AS BIGINT) AS n_customers, 'nation' AS level
FROM base GROUP BY n_name
UNION ALL
SELECT r_name AS group_name, CAST(COUNT(*) AS BIGINT) AS n_customers, 'region' AS level
FROM base GROUP BY r_name
"""


def q_error_routing(spark, sf_dir):
    """U4 category routing via CASE dim (obvious/review/tests/ignored,
    `generate_webpage_with_error_output.py:277-1081`)."""
    e = _t(spark, sf_dir, "events")
    cat = (
        F.when(F.col("event_type").isin("click", "view"), "obvious")
        .when(F.col("event_type").isin("purchase"), "review")
        .otherwise("ignored")
    )
    return (
        e.withColumn("category", cat)
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


SQL_ROUTING = """
SELECT CASE WHEN event_type IN ('click','view') THEN 'obvious'
            WHEN event_type IN ('purchase') THEN 'review'
            ELSE 'ignored' END AS category,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS total_value
FROM events GROUP BY 1
"""


def q_json_tag_filter(spark, sf_dir):
    """P1/F7: dynamic JSON payload → typed access at the boundary
    (`load_osm_file.py:41` json tags)."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.withColumn("k", k)
        .filter(F.col("k") < 50)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
    )


SQL_JSON = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) < 50
GROUP BY event_type
"""


def q_topk_per_group(spark, sf_dir):
    """W3 top-K re-rank per key (kNN re-rank shape)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rank")
    )


SQL_TOPK = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, CAST(rank AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
) WHERE rank <= 3
"""


def q_sessionize(spark, sf_dir):
    """T-family streaming shape done relationally: gap-based
    sessionization (30-min gap) via lag + running sum — the batch
    equivalent of session windows."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestampdiff is timezone-free on NTZ values (unix_timestamp is not).
    # MICROSECOND, not SECOND: the DuckDB oracle's EPOCH() keeps sub-second
    # precision, and a 1800.886s gap must open a new session on both sides
    # (SECOND truncation called it 1800 and merged the sessions).
    gap = F.expr("timestampdiff(MICROSECOND, lag(ts) over (partition by user_id order by ts, event_id), ts)")
    new_s = ((gap > 1_800_000_000) | gap.isNull()).cast("int")
    sess = F.sum(new_s).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        e.withColumn("session_id", sess)
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )


SQL_SESSIONIZE = """
SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM (
  SELECT user_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM (
    SELECT user_id, ts, event_id,
           CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800 THEN 1
                ELSE 0 END AS new_s
    FROM events
  )
) GROUP BY user_id
"""


def q_event_windows(spark, sf_dir):
    """Tumbling event-time window aggregation (Structured-Streaming
    shape, run in batch)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            # string render of the NTZ value — independent of the
            # session timezone (unix_timestamp on NTZ is not)
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n",
        )
    )


SQL_WINDOWS = """
SELECT CAST(DATE_TRUNC('hour', ts) AS VARCHAR) AS window_start,
       event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# spatial operators
# ---------------------------------------------------------------------------

def q_cell_encode(spark, sf_dir):
    """DGG cell encoding as pure Catalyst expressions + count per cell."""
    pts = _pts(spark, sf_dir)
    return (
        pts.withColumn("cell", C.cell_col(F.col("lon"), F.col("lat"), CELL_RES))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_CELL_ENCODE_TMPL = """
WITH pts AS (
  SELECT c_custkey, {lon} AS lon, {lat} AS lat FROM customer
)
SELECT {cell} AS cell, CAST(COUNT(*) AS BIGINT) AS n
FROM pts GROUP BY 1
"""


def q_tile_assign(spark, sf_dir):
    """Web-Mercator XYZ raster-tile assignment (north-star tiling)."""
    pts = _pts(spark, sf_dir)
    return (
        TI.assign_tiles(pts, TILE_Z)
        .groupBy("tile_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min("c_custkey").alias("min_key"))
    )


SQL_TILE_TMPL = """
WITH pts AS (
  SELECT c_custkey, {lon} AS lon, {lat} AS lat FROM customer
)
SELECT {tile} AS tile_id, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(c_custkey) AS BIGINT) AS min_key
FROM pts GROUP BY 1
"""


def q_bbox_join(spark, sf_dir):
    """J4 point-in-bbox spatial join (range predicates; bboxes mirror
    `osm_editor_bot_for_approved_tasks.py:241-253`)."""
    pts = _pts(spark, sf_dir)
    boxes = spark.createDataFrame(
        [
            ("box-a", -180.0, -85.0, -60.0, 0.0),
            ("box-b", -60.0, 0.0, 60.0, 85.0),
            ("box-c", 60.0, -85.0, 180.0, 85.0),
        ],
        "box_id string, x0 double, y0 double, x1 double, y1 double",
    )
    return (
        pts.join(
            F.broadcast(boxes),
            (F.col("lon") >= F.col("x0"))
            & (F.col("lon") <= F.col("x1"))
            & (F.col("lat") >= F.col("y0"))
            & (F.col("lat") <= F.col("y1")),
        )
        .groupBy("box_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_BBOX_TMPL = """
WITH pts AS (
  SELECT c_custkey, {lon} AS lon, {lat} AS lat FROM customer
), boxes(box_id, x0, y0, x1, y1) AS (
  VALUES ('box-a', -180.0, -85.0, -60.0, 0.0),
         ('box-b', -60.0, 0.0, 60.0, 85.0),
         ('box-c', 60.0, -85.0, 180.0, 85.0)
)
SELECT box_id, CAST(COUNT(*) AS BIGINT) AS n
FROM pts JOIN boxes
  ON lon >= x0 AND lon <= x1 AND lat >= y0 AND lat <= y1
GROUP BY box_id
"""

# convex quad for the PIP oracle (CCW): half-plane test is exact SQL
_QUAD = [(-100.0, -60.0), (20.0, -70.0), (60.0, 40.0), (-80.0, 60.0)]


def q_pip_convex(spark, sf_dir):
    """J5 exact point-in-polygon through the engine's cell-cover +
    ray-cast refine path, checked against a half-plane SQL oracle."""
    pts = _pts(spark, sf_dir)
    ring = [(x, y) for x, y in _QUAD] + [_QUAD[0]]
    poly = spark.createDataFrame(
        [("oracle", "quad-0", [ring])],
        "region string, polygon_id string, rings array<array<struct<lon:double,lat:double>>>",
    )
    hits = SJ.point_in_polygon_join(pts, poly, res=4)
    return hits.select("c_custkey", "polygon_id")


def _sql_pip() -> str:
    conds = []
    n = len(_QUAD)
    for i in range(n):
        x0, y0 = _QUAD[i]
        x1, y1 = _QUAD[(i + 1) % n]
        conds.append(
            f"(({x1} - {x0}) * (lat - {y0}) - ({y1} - {y0}) * (lon - {x0})) >= 0"
        )
    cond = " AND ".join(conds)
    return f"""
WITH pts AS (
  SELECT c_custkey, {_LON} AS lon, {_LAT} AS lat FROM customer
)
SELECT c_custkey, 'quad-0' AS polygon_id FROM pts WHERE {cond}
"""


def q_knn(spark, sf_dir):
    """J9 kNN, brute-force physical strategy (broadcast + re-rank)."""
    return KNN.knn_bruteforce(
        _pts(spark, sf_dir), _supplier_pts(spark, sf_dir), k=3,
        q_key="c_custkey", e_key="s_suppkey",
    ).select("c_custkey", "s_suppkey", F.round("dist_km", 4).alias("dist_km"), "rank")


def q_knn_kring(spark, sf_dir):
    """J9 kNN via the k-ring cell-index path — must equal brute force."""
    return KNN.knn_kring(
        _pts(spark, sf_dir), _supplier_pts(spark, sf_dir), k=3,
        initial_ring=1, max_ring=64,
        q_key="c_custkey", e_key="s_suppkey",
    ).select("c_custkey", "s_suppkey", F.round("dist_km", 4).alias("dist_km"), "rank")


SQL_KNN = f"""
WITH q AS (
  SELECT c_custkey, {_LON} AS lon, {_LAT} AS lat FROM customer
), e AS (
  SELECT s_suppkey, {_S_LON} AS lon, {_S_LAT} AS lat FROM supplier
), d AS (
  SELECT q.c_custkey, e.s_suppkey,
         2 * 6371.0088 * ASIN(SQRT(LEAST(
            POW(SIN((RADIANS(e.lat) - RADIANS(q.lat)) / 2), 2)
            + COS(RADIANS(q.lat)) * COS(RADIANS(e.lat))
              * POW(SIN((RADIANS(e.lon) - RADIANS(q.lon)) / 2), 2), 1.0))) AS dist_km
  FROM q CROSS JOIN e
)
SELECT c_custkey, s_suppkey, ROUND(dist_km, 4) AS dist_km, CAST(rank AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY dist_km ASC, s_suppkey ASC) AS rank
  FROM d
) WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# text / dedup / embeddings (training-data pipeline)
# ---------------------------------------------------------------------------

def q_token_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count_col(F.col("text")).alias("n_tokens"),
        "n_chars",
    )


SQL_TOKEN_COUNT = """
SELECT doc_id,
       CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), x -> x <> '')) AS INT) AS n_tokens,
       n_chars
FROM documents
"""


def q_bpe_token_count(spark, sf_dir):
    """Subword-style (BPE-ish regex) token counting alongside the
    whitespace count — the training-data budget estimators."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        TX.token_count_col(F.col("text")).alias("ws_tokens"),
        TX.bpe_ish_token_count_col(F.col("text")).alias("bpe_tokens"),
    )


SQL_BPE_TOKENS = """
SELECT doc_id,
       CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), x -> x <> '')) AS INT) AS ws_tokens,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS bpe_tokens
FROM documents
"""


def q_quality_score(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TX.quality_score_col(F.col("text")).alias("quality"))


SQL_QUALITY = """
WITH t AS (
  SELECT doc_id, text,
         LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+'), x -> x <> '') AS toks,
         CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), x -> x <> '')) AS DOUBLE) AS n_tok,
         LENGTH(text) AS n,
         LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g')) AS punct
  FROM documents
)
SELECT doc_id,
       ROUND(
         LEAST(n_tok / 20.0, 1.0) * (
           0.5
           + 0.25 * (1.0 - LEAST((CASE WHEN n > 0 THEN CAST(punct AS DOUBLE)/n ELSE 0.0 END) * 4, 1.0))
           + 0.25 * LEAST((CASE WHEN LEN(toks) > 0 THEN CAST(LEN(LIST_FILTER(toks, x -> LIST_CONTAINS({stop}, x))) AS DOUBLE)/LEN(toks) ELSE 0.0 END) * 5, 1.0)
         ), 6) AS quality
FROM t
""".format(stop="[" + ",".join(f"'{s}'" for s in TX.STOPWORDS) + "]")


def q_fingerprint(spark, sf_dir):
    """Exact-dedup fingerprint (md5 — portable across engines)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint_col(F.col("text")).alias("fingerprint"))


SQL_FINGERPRINT = "SELECT doc_id, MD5(text) AS fingerprint FROM documents"


def q_exact_dup_groups(spark, sf_dir):
    return DD.exact_dup_groups(_t(spark, sf_dir, "documents")).select(
        "fingerprint", "n_dups", "keeper_id"
    )


SQL_DUP_GROUPS = """
SELECT MD5(text) AS fingerprint, CAST(COUNT(*) AS BIGINT) AS n_dups,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_id
FROM documents GROUP BY 1 HAVING COUNT(*) > 1
"""


def q_token_jaccard(spark, sf_dir):
    """n-gram (1-gram) Jaccard near-dup pairs via inverted index."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    return DD.token_jaccard_pairs(d, threshold=0.6)


SQL_JACCARD = """
WITH toks AS (
  SELECT DISTINCT doc_id AS id, UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) AS tok
  FROM documents WHERE doc_id < 120
), toks2 AS (SELECT id, tok FROM toks WHERE tok <> ''),
sizes AS (SELECT id, COUNT(*) AS sz FROM toks2 GROUP BY id),
shared AS (
  SELECT a.id AS id1, b.id AS id2, COUNT(*) AS shared
  FROM toks2 a JOIN toks2 b ON a.tok = b.tok AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id1, id2, ROUND(CAST(shared AS DOUBLE) / (s1.sz + s2.sz - shared), 6) AS jaccard
FROM shared
JOIN sizes s1 ON s1.id = id1
JOIN sizes s2 ON s2.id = id2
WHERE CAST(shared AS DOUBLE) / (s1.sz + s2.sz - shared) >= 0.6
"""


def q_embedding_topk(spark, sf_dir):
    """ANN baseline: exact cosine top-k, JVM higher-order functions."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 30)
    return ANN.cosine_topk_native(q, e, k=3).select(
        "vec_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank"
    )


SQL_EMB_TOPK = """
WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 30),
c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
d AS (
  SELECT q.vec_id, c.vec_id AS neighbor_id,
         ROUND(LIST_DOT_PRODUCT(q.v, c.v) /
               (SQRT(LIST_DOT_PRODUCT(q.v, q.v)) * SQRT(LIST_DOT_PRODUCT(c.v, c.v))), 6) AS cosine
  FROM q CROSS JOIN c WHERE q.vec_id <> c.vec_id
)
SELECT vec_id, neighbor_id, ROUND(cosine, 4) AS cosine, CAST(rank AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM d
) WHERE rank <= 3
"""


# --- no-oracle (rows-only) entries: genuinely non-SQL-expressible ---

def q_lang_id(spark, sf_dir):
    """Language-ID heuristic (pandas UDF) — rows-only check."""
    d = _t(spark, sf_dir, "documents")
    lang_udf = F.pandas_udf(TX.lang_id_batch, "string")
    return d.select("doc_id", lang_udf(F.col("text")).alias("pred_lang"))


def q_minhash_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return DD.minhash_lsh_pairs(d, threshold=0.5)


def q_simhash_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return DD.simhash_pairs(d, max_hamming=6)


def q_ann_ivf(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 30)
    return ANN.ivf_topk(q, e, k=3, n_centroids=8, nprobe=3)


def q_embedding_neardup(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    return DD.embedding_neardup_pairs(e, threshold=0.8)


def q_merge_upsert(spark, sf_dir):
    """J2 MERGE through the operator itself: 'base' = orders before
    1997, 'delta' = orders from 1996 on (overlapping year exercises the
    newer-wins branch); result = newest row per customer."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "_ts", F.unix_timestamp(F.col("o_orderdate").cast("timestamp")) + F.col("o_orderkey") % 86400
    )
    base = o.filter(F.col("o_orderdate") < "1997-01-01")
    delta = o.filter(F.col("o_orderdate") >= "1996-01-01")
    merged = UP.merge_upsert(base, delta, key_cols=["o_custkey"], ts_col="_ts")
    return merged.select(
        "o_custkey", "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
    )


SQL_MERGE_UPSERT = """
WITH u AS (
  SELECT *, EPOCH(o_orderdate) + o_orderkey % 86400 AS _ts
  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  UNION ALL
  SELECT *, EPOCH(o_orderdate) + o_orderkey % 86400 AS _ts
  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
)
SELECT o_custkey, o_orderkey, STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY _ts DESC) AS rn
  FROM u
) WHERE rn = 1
"""


def q_cell_parent_rollup(spark, sf_dir):
    """Hierarchical cell rollup: encode at res 7, coarsen to res 4 via
    bit math (parent_cell_col), count per parent — the partition-
    pruning prefix the Iceberg layout keys on (SURVEY §4)."""
    pts = _pts(spark, sf_dir)
    fine = pts.withColumn("cell", C.cell_col(F.col("lon"), F.col("lat"), CELL_RES))
    return (
        fine.withColumn("parent", C.parent_cell_col(F.col("cell"), CELL_RES, 4))
        .groupBy("parent")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_CELL_PARENT_TMPL = """
WITH pts AS (
  SELECT c_custkey, {lon} AS lon, {lat} AS lat FROM customer
)
SELECT {parent_cell} AS parent, CAST(COUNT(*) AS BIGINT) AS n
FROM pts GROUP BY 1
"""


def q_rollup_hierarchy(spark, sf_dir):
    """SQL ROLLUP (grouping sets) — free from Spark SQL per SURVEY §2.4
    note; the merged-region two-level rollup's general form."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


SQL_ROLLUP_HIER = """
SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


def q_dedup_keep_lowest(spark, sf_dir):
    """exact_dedup operator surface: keeper doc per fingerprint."""
    return DD.exact_dedup(_t(spark, sf_dir, "documents")).select("doc_id", "n_chars")


SQL_DEDUP_KEEP = """
SELECT doc_id, n_chars FROM documents
WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY MD5(text))
"""


def q_wiki_link_parse(spark, sf_dir):
    """F1 scalar: 'lang:Article' split (`generate_webpage_with_error_
    output.py:196-200`) over synthetic link strings."""
    p = _t(spark, sf_dir, "part")
    link = F.concat(
        F.when(F.col("p_partkey") % 3 == 0, F.lit("de")).otherwise(F.lit("en")),
        F.lit(":"),
        F.col("p_name"),
    )
    df = p.select("p_partkey", link.alias("link"))
    return df.select(
        "p_partkey",
        F.get(F.split("link", ":", 2), 0).alias("lang"),
        F.get(F.split("link", ":", 2), 1).alias("article"),
    )


SQL_WIKI_PARSE = """
WITH links AS (
  SELECT p_partkey,
         (CASE WHEN p_partkey % 3 = 0 THEN 'de' ELSE 'en' END) || ':' || p_name AS link
  FROM part
)
SELECT p_partkey, STR_SPLIT(link, ':')[1] AS lang, STR_SPLIT(link, ':')[2] AS article
FROM links
"""


# --- engine-native spatial/image pipeline (synthetic world; rows-only:
#     the DuckDB oracle cannot see these generated tables — their exact
#     semantics are pinned by the pytest brute-force oracles instead) ---

def q_spatial_error_reports(spark, sf_dir):
    """The flagship validator pipeline's report rows (V1+J1+J5+P*).

    The report struct (contains map columns) is projected through
    `to_json` so the driver's pandas canonicalizer can sort/hash the
    rows — map/dict cells are unhashable in pandas."""
    from . import pipeline as P

    inputs = P.build_inputs(spark, 500)
    validated = P.validated_elements(inputs)
    reports = P.error_reports(validated, inputs["regions"])
    return reports.select(
        "area_identifier",
        "type",
        "id",
        "error_id",
        "osm_object_url",
        F.to_json("report").alias("report_json"),
    )


def q_tile_vector_assignment(spark, sf_dir):
    """Raster-tile↔vector assignment rollup over the image table."""
    from ..datagen import world as W
    from ..operators import tiles as TI

    images = W.spark_images_located(spark, 2000)
    hits = SJ.point_in_polygon_join(TI.assign_tiles(images, 8), W.spark_polygons(spark))
    return hits.groupBy("tile_id", "region").agg(
        F.count(F.lit(1)).alias("n_images")
    )


def q_all_points_inside(spark, sf_dir):
    """J6 universal-quantifier containment over multi-point objects."""
    from ..datagen import world as W

    elems = W.spark_elements(spark, 400).filter(F.col("type") != "node")
    return SJ.all_points_inside(elems, W.spark_polygons(spark))


def q_image_invariants(spark, sf_dir):
    """Per-row content invariant: decode round-trip PSNR (≥40dB lossy),
    stored-phash match, caption integrity (BASELINE.json input_hint)."""
    from ..datagen import world as W
    from ..operators import images_ops as IO

    return IO.verify_invariants(W.spark_images(spark, 300))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": q_pricing_summary,
        "latest_order_per_customer": q_latest_order_per_customer,
        "merge_upsert": q_merge_upsert,
        "top_stalest": q_top_stalest,
        "argmax_acctbal": q_argmax_acctbal,
        "broadcast_join_revenue": q_broadcast_join_revenue,
        "anti_join_customers": q_anti_join_customers,
        "universal_quantifier": q_universal_quantifier,
        "rollup_merged": q_rollup_merged,
        "error_routing": q_error_routing,
        "json_tag_filter": q_json_tag_filter,
        "topk_per_group": q_topk_per_group,
        "sessionize": q_sessionize,
        "event_windows": q_event_windows,
        "cell_encode": q_cell_encode,
        "tile_assign": q_tile_assign,
        "bbox_join": q_bbox_join,
        "pip_convex": q_pip_convex,
        "knn": q_knn,
        "knn_kring": q_knn_kring,
        "token_count": q_token_count,
        "bpe_token_count": q_bpe_token_count,
        "quality_score": q_quality_score,
        "fingerprint": q_fingerprint,
        "exact_dup_groups": q_exact_dup_groups,
        "token_jaccard": q_token_jaccard,
        "embedding_topk": q_embedding_topk,
        "lang_id": q_lang_id,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "ann_ivf": q_ann_ivf,
        "embedding_neardup": q_embedding_neardup,
        "cell_parent_rollup": q_cell_parent_rollup,
        "rollup_hierarchy": q_rollup_hierarchy,
        "dedup_keep_lowest": q_dedup_keep_lowest,
        "wiki_link_parse": q_wiki_link_parse,
        "spatial_error_reports": q_spatial_error_reports,
        "tile_vector_assignment": q_tile_vector_assignment,
        "all_points_inside": q_all_points_inside,
        "image_invariants": q_image_invariants,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": SQL_PRICING,
        "latest_order_per_customer": SQL_LATEST_ORDER,
        "merge_upsert": SQL_MERGE_UPSERT,
        "top_stalest": SQL_TOP_STALEST,
        "argmax_acctbal": SQL_ARGMAX,
        "broadcast_join_revenue": SQL_BROADCAST_JOIN,
        "anti_join_customers": SQL_ANTI_JOIN,
        "universal_quantifier": SQL_UNIVERSAL,
        "rollup_merged": SQL_ROLLUP,
        "error_routing": SQL_ROUTING,
        "json_tag_filter": SQL_JSON,
        "topk_per_group": SQL_TOPK,
        "sessionize": SQL_SESSIONIZE,
        "event_windows": SQL_WINDOWS,
        "cell_encode": SQL_CELL_ENCODE_TMPL.format(
            lon=_LON, lat=_LAT, cell=C.cell_sql("lon", "lat", CELL_RES)
        ),
        "tile_assign": SQL_TILE_TMPL.format(
            lon=_LON, lat=_LAT, tile=TI.tile_id_sql("lon", "lat", TILE_Z)
        ),
        "bbox_join": SQL_BBOX_TMPL.format(lon=_LON, lat=_LAT),
        # parent at res 4 == direct encode at res 4 (power-of-two scaling
        # is exact in IEEE doubles, so the coarsened bit math agrees)
        "cell_parent_rollup": SQL_CELL_PARENT_TMPL.format(
            lon=_LON, lat=_LAT, parent_cell=C.cell_sql("lon", "lat", 4)
        ),
        "rollup_hierarchy": SQL_ROLLUP_HIER,
        "dedup_keep_lowest": SQL_DEDUP_KEEP,
        "wiki_link_parse": SQL_WIKI_PARSE,
        "pip_convex": _sql_pip(),
        "knn": SQL_KNN,
        "knn_kring": SQL_KNN,
        "token_count": SQL_TOKEN_COUNT,
        "bpe_token_count": SQL_BPE_TOKENS,
        "quality_score": SQL_QUALITY,
        "fingerprint": SQL_FINGERPRINT,
        "exact_dup_groups": SQL_DUP_GROUPS,
        "token_jaccard": SQL_JACCARD,
        "embedding_topk": SQL_EMB_TOPK,
        # lang_id / minhash_pairs / simhash_pairs / ann_ivf /
        # embedding_neardup: non-SQL-expressible → rows-only check
    }
