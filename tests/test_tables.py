import pyspark.sql.functions as F

from osm_wikipedia_tag_validator_spark.sources import tables as T


def test_snapshot_write_read_time_travel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df1 = spark.createDataFrame(
        [("node", 1, 100, "a"), ("node", 2, 100, "b")],
        "type string, id long, download_timestamp long, payload string",
    )
    m1 = T.write_table(df1, path, partition_by=["type"])
    df2 = spark.createDataFrame(
        [("node", 1, 200, "a2"), ("node", 2, 100, "b"), ("node", 3, 150, "c")],
        "type string, id long, download_timestamp long, payload string",
    )
    m2 = T.write_table(df2, path, partition_by=["type"])
    assert m2["parent_snapshot_id"] == m1["snapshot_id"]

    cur = T.read_table(spark, path).toPandas()
    assert len(cur) == 3
    old = T.read_table(spark, path, m1["snapshot_id"]).toPandas()
    assert len(old) == 2
    assert len(T.snapshots(path)) == 2

    delta = T.read_incremental(
        spark, path, m1["snapshot_id"], key_cols=["type", "id"]
    ).toPandas()
    # changed row 1 (new ts) + inserted row 3; unchanged row 2 excluded
    assert sorted(delta["id"]) == [1, 3]
    assert delta.set_index("id").loc[1, "payload"] == "a2"


def test_cell_prefix_partition_pruning(spark, tmp_path):
    """North-rule element: partition pruning rides the hidden
    partitioning on the grid-cell prefix. A filter on the coarse cell
    must become a planning-time PartitionFilter (whole partition
    directories skipped), not a post-scan row filter."""
    import contextlib
    import io

    path = str(tmp_path / "imgs")
    # points spread across the globe → several coarse parent cells
    pts = spark.range(4000).select(
        F.col("id"),
        (((F.col("id") * 7919) % 36000) / 100.0 - 180.0).alias("lon"),
        (((F.col("id") * 104729) % 17000) / 100.0 - 85.0).alias("lat"),
    )
    part = T.with_cell_partition(pts, res=7, parent_res=1)
    T.write_table(part, path, partition_by=["cell_p"])

    full = T.read_table(spark, path)
    vals = sorted(r["cell_p"] for r in full.select("cell_p").distinct().collect())
    assert len(vals) >= 4  # several partition directories exist
    one = vals[0]

    pruned = full.filter(F.col("cell_p") == one)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain(True)
    plan = buf.getvalue()
    # the filter must appear under PartitionFilters in the scan node,
    # and must NOT degrade into a pushed DATA filter on cell_p
    import re

    part_f = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    push_f = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert part_f and "cell_p" in part_f.group(1), plan[-2000:]
    assert push_f is not None and "cell_p" not in push_f.group(1)
    # semantics: counts match the unpartitioned predicate
    assert pruned.count() == part.filter(F.col("cell_p") == one).count()


def test_iceberg_flag_plumbing_without_runtime(spark, tmp_path):
    """The backend switch is real even where the jar is absent: auto
    resolves to the manifest stand-in, an explicit iceberg request
    fails fast with the exact remediation, and the conf payload /
    identifier mapping a cluster deployment needs are well-formed."""
    import pytest

    assert T.iceberg_available(spark) is False
    assert T._resolve_backend(spark, "auto") == "manifest"
    with pytest.raises(RuntimeError, match="--packages"):
        T._resolve_backend(spark, "iceberg")
    with pytest.raises(ValueError):
        T._resolve_backend(spark, "hudi")

    confs = T.iceberg_spark_confs("/wh")
    assert confs["spark.sql.catalog.graft.type"] == "hadoop"
    assert confs["spark.sql.catalog.graft.warehouse"] == "/wh"
    assert "IcebergSparkSessionExtensions" in confs["spark.sql.extensions"]
    submit = T.iceberg_submit_confs("/wh")
    assert submit.count("--conf ") == 4

    assert T.iceberg_table_ident("/data/owtv/elements") == "graft.owtv.elements"
    assert T.iceberg_table_ident("elements") == "graft.default.elements"
    assert T.iceberg_table_ident("/a/b-c/d.e") == "graft.b_c.d_e"

    # and the auto path actually lands in the manifest implementation
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame([("node", 1, 1, "x")],
                               "type string, id long, download_timestamp long, payload string")
    m = T.write_table(df, path)
    assert (tmp_path / "tbl" / "manifest.json").exists()
    assert T.read_table(spark, path, m["snapshot_id"]).count() == 1


def test_iceberg_backend_real(spark, tmp_path):
    """Mirror of test_snapshot_write_read_time_travel on the REAL
    backend. Skips in this sandbox: no Iceberg runtime jar ships in
    pyspark/jars and the container is offline (see the gap note in
    sources/tables.py) — on a cluster, run under
    spark-submit --packages $ICEBERG_RUNTIME_PACKAGE with
    iceberg_spark_confs(warehouse)."""
    import pytest

    if not T.iceberg_available(spark):
        pytest.skip("Iceberg runtime jar not available in this sandbox")
    path = "tmp_iceberg_test/tbl"
    df1 = spark.createDataFrame(
        [("node", 1, 100, "a")],
        "type string, id long, download_timestamp long, payload string",
    )
    m1 = T.write_table(df1, path, partition_by=["type"], backend="iceberg")
    df2 = spark.createDataFrame(
        [("node", 1, 200, "a2"), ("node", 2, 100, "b")],
        "type string, id long, download_timestamp long, payload string",
    )
    m2 = T.write_table(df2, path, partition_by=["type"], backend="iceberg")
    assert m2["parent_snapshot_id"] == m1["snapshot_id"]
    assert T.read_table(spark, path, backend="iceberg").count() == 2
    assert T.read_table(spark, path, m1["snapshot_id"], backend="iceberg").count() == 1
