"""Data-driven splitting of oversized regions into processing parts.

The reference splits too-big regions into admin-subdivision configs by
hand (`produce_internal_divisions_for_regions_processed.py:45-345` —
a human picks `admin_level` children for ES-CT, DE-NI, GB-ENG, ...).
The Spark-first analog derives the split from the DATA: build a per-
(region, coarse-cell) histogram (one map-side-combined aggregation),
then assign cells to parts with a running-sum rule over the Z-ordered
cell ids — parts are contiguous in Z-order, so each part is a compact
spatial chunk whose element count ≈ the processing budget. At 100 TB
this is exactly partition budgeting: the histogram is tiny (regions ×
coarse cells), the part map broadcasts, and the expensive downstream
pass shuffles on (region, part) instead of one hot mega-region.

The assignment rule `part = floor((cumsum - cnt) / budget)` is pure
window algebra, so the whole operator is SQL-expressible and oracle-
checked (q_region_parts); a single cell hotter than the budget gets a
part of its own (it cannot be split below the histogram resolution —
raise `res` if that matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import cells as C


def region_part_map(
    points: DataFrame,
    budget: int,
    region_col: str = "area_identifier",
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = 4,
) -> DataFrame:
    """(region, cell, cnt, part) — Z-order-contiguous parts of ≈budget
    elements each. One aggregation + one small window; the result is
    dim-sized (broadcast it into `assign_parts`)."""
    hist = (
        points.withColumn("cell", C.cell_col(F.col(lon_col), F.col(lat_col), res))
        .groupBy(region_col, "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(region_col).orderBy("cell")
    return hist.withColumn(
        "part",
        F.floor((F.sum("cnt").over(w) - F.col("cnt")) / F.lit(budget)).cast("int"),
    )


def assign_parts(
    points: DataFrame,
    part_map: DataFrame,
    region_col: str = "area_identifier",
    lon_col: str = "lon",
    lat_col: str = "lat",
    res: int = 4,
) -> DataFrame:
    """Tag each row with its processing part via a broadcast equi-join
    on (region, cell) — the fact side never shuffles."""
    tagged = points.withColumn("cell", C.cell_col(F.col(lon_col), F.col(lat_col), res))
    return tagged.join(
        F.broadcast(part_map.select(region_col, "cell", "part")),
        [region_col, "cell"],
        "left",
    ).withColumn("part", F.coalesce("part", F.lit(0)))


def oversized_regions(
    part_map: DataFrame, region_col: str = "area_identifier"
) -> DataFrame:
    """Regions that actually split (>1 part) with their part/element
    counts — the engine's answer to the reference's hand-maintained
    'which regions need internal divisions' list."""
    return (
        part_map.groupBy(region_col)
        .agg(
            (F.max("part") + 1).alias("n_parts"),
            F.sum("cnt").alias("n_elements"),
        )
        .filter(F.col("n_parts") > 1)
    )
