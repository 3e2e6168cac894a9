"""Table IO: driver testdata loader + partitioned lakehouse-style writer.

On a production cluster the engine's tables are Iceberg (hidden
partitioning on the grid-cell prefix + region, snapshot-isolated
commits, incremental scans — SURVEY.md §4). This container has no
Iceberg runtime jar, so `write_table`/`read_table` realize the same
layout with partitioned parquet + an atomically-committed JSON manifest
(the Iceberg-commit stand-in the reference approximated with temp-file
rename, `obtain_from_overpass.py:45-51`). The API is catalog-shaped so
swapping in `spark.read.table(...)`/`writeTo(...).using("iceberg")` is
a one-line change per call site.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TESTDATA_TABLES}


def register_testdata(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_testdata(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    snapshot_meta: dict | None = None,
) -> dict:
    """Partitioned parquet write + atomic manifest commit.

    The manifest carries snapshot lineage (id, ts, parent) — the
    engine's checkpoint/resume layer keys on it (streaming/checkpoint).
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(path, "data"))
    manifest = {
        "snapshot_id": uuid.uuid4().hex,
        "committed_at": int(time.time()),
        "partition_by": partition_by or [],
        "meta": snapshot_meta or {},
    }
    prev = read_manifest(path)
    if prev:
        manifest["parent_snapshot_id"] = prev.get("snapshot_id")
    tmp = os.path.join(path, f"_manifest.{manifest['snapshot_id']}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, "manifest.json"))  # atomic commit
    return manifest


def read_manifest(path: str) -> dict | None:
    p = os.path.join(path, "manifest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "data"))
