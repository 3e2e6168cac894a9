"""Snapshot upsert / dedup — W1/J2 of SURVEY.md §2.

Reference: per-row SELECT-then-DELETE+INSERT keyed on (type, id, area)
keeping the newest download (`load_osm_file.py:27-41`), plus stale-
report invalidation (`script.py:191-255`). Here:

  * `latest_per_key` — window dedup, the read-side MERGE equivalent.
  * `merge_upsert` — full-outer MERGE between a base snapshot and a
    delta batch (Iceberg MERGE INTO is the cluster-side realization;
    this expresses the same plan over plain DataFrames).
  * `invalidate_stale` — T2: rows whose stored report predates a newer
    download lose their report (re-validation required).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType


def _contains_map(dt: DataType) -> bool:
    """True if the type transitively contains a MapType — xxhash64
    rejects maps at ANY nesting depth (DATATYPE_MISMATCH.HASH_MAP_TYPE),
    not just top-level, so the fingerprint must serialize e.g.
    array<struct<m:map<...>>> columns too (the shape of the validator's
    proposed_tagging_changes struct)."""
    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _contains_map(dt.elementType)
    if isinstance(dt, StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    return False


def latest_per_key(
    df: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "download_timestamp",
) -> DataFrame:
    """Keep the newest row per key. Shuffle is one hash exchange on the
    key (unavoidable for a global dedup; at 100 TB bucket the table by
    the key to elide it).

    Determinism: equal-timestamp rows within a key are broken by a
    content fingerprint (xxhash64 over every column), so the winner is
    a pure function of row content — stable across repartitionings and
    input order. Rows that tie on the fingerprint are byte-identical,
    so the pick is immaterial."""
    key_cols = key_cols or ["type", "id"]
    # maps aren't hashable in Spark (at any nesting depth); serialize
    # any map-bearing column for the fingerprint
    finger = [
        F.to_json(f.name) if _contains_map(f.dataType) else F.col(f.name)
        for f in df.schema.fields
    ]
    tie = F.xxhash64(*finger) if finger else F.lit(0)
    w = Window.partitionBy(*key_cols).orderBy(F.desc(ts_col), F.asc(tie))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    base: DataFrame,
    delta: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "download_timestamp",
) -> DataFrame:
    """MERGE: delta wins only when STRICTLY newer, base kept otherwise
    (including ts ties — `load_osm_file.py:34` keeps the existing row
    unless `timestamp > present_already_timestamp`), inserts pass
    through. Equivalent to Iceberg `MERGE INTO base USING delta ON keys
    WHEN MATCHED AND delta.ts > base.ts THEN UPDATE * WHEN NOT MATCHED
    THEN INSERT *`.

    Determinism: rows are tagged with a source rank (base=0, delta=1)
    before the union and the window orders by (desc ts, asc source), so
    a delta row with ts equal to the base row deterministically loses."""
    key_cols = key_cols or ["type", "id"]
    unioned = base.withColumn("_src", F.lit(0)).unionByName(
        delta.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(*key_cols).orderBy(F.desc(ts_col), F.asc("_src"))
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def invalidate_stale(
    df: DataFrame,
    new_download_ts_col: str = "new_download_timestamp",
    ts_col: str = "download_timestamp",
    report_cols: tuple[str, ...] = ("error_id", "report", "status"),
) -> DataFrame:
    """T2 (`script.py:232-255`): any row older than the area's new
    download loses its stored report → status back to 'unchecked'."""
    stale = F.col(ts_col) < F.col(new_download_ts_col)
    out = df
    for c in report_cols:
        if c in df.columns and c != "status":
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    if "status" in df.columns:
        out = out.withColumn(
            "status", F.when(stale, F.lit("unchecked")).otherwise(F.col("status"))
        )
    return out
