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
