"""Region-config validation + staleness-priority scheduling.

P11 (`check_for_malformed_definitions_of_entries`, `script.py:169-174`)
and A8/O1 (priority = age × multiplier, skip hidden; `script.py:118-157`).
Driver-side concerns operating on the small regions dim — they shape
WHICH partitions the resumable job processes first, mirroring the
reference's stalest-first loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def check_region_config(regions: DataFrame) -> None:
    """Constraint check on the dim load: '/' is forbidden in region
    names (they become file/partition path segments)."""
    bad = regions.filter(F.col("internal_region_name").contains("/")).count()
    if bad:
        raise ValueError(f"{bad} region name(s) contain '/' — malformed config")


def region_priority(
    regions: DataFrame,
    watermarks: DataFrame,
    now_ts: int,
) -> DataFrame:
    """Stalest×multiplier-first processing order (`script.py:123-126`):
    score = (now - last_download_ts) * priority_multiplier; regions
    never downloaded (NULL watermark) sort first (infinite staleness,
    `script.py:362-367` missing-data semantics); hidden regions are
    skipped (P9)."""
    w = watermarks.select(
        F.col("partition").alias("internal_region_name"),
        F.col("watermark_ts"),
    ).groupBy("internal_region_name").agg(F.max("watermark_ts").alias("last_ts"))
    return (
        regions.filter(~F.coalesce("hidden", F.lit(False)))
        .join(w, "internal_region_name", "left")
        .withColumn(
            "priority_score",
            F.when(F.col("last_ts").isNull(), F.lit(float("inf"))).otherwise(
                (F.lit(now_ts) - F.col("last_ts")) * F.col("priority_multiplier")
            ),
        )
        .orderBy(F.desc("priority_score"), F.asc("internal_region_name"))
        .select("internal_region_name", "priority_score", "last_ts")
    )
