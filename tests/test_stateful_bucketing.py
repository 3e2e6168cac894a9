import os

import pyspark.sql.functions as F
import pytest

from osm_wikipedia_tag_validator_spark.streaming import events as SE
from osm_wikipedia_tag_validator_spark.streaming.stateful import changed_values_stream


def test_stateful_change_tracking(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "src")
    # two micro-batch files so state must carry across batches
    ev.withColumn("b", F.col("event_id") % 2).repartition("b").drop("b").write.parquet(src)
    stream = SE.stream_events_from_files(spark, src, ev.schema, max_files_per_trigger=1)
    out = SE.run_stream_to_memory(
        changed_values_stream(stream), "changes", output_mode="append"
    ).toPandas()
    assert len(out) > 0
    # per user: n_changes strictly increasing, first change has no prev
    for uid, grp in out.groupby("user_id"):
        g = grp.sort_values("n_changes")
        assert list(g["n_changes"]) == list(range(1, len(g) + 1))
        assert g["prev_value"].iloc[0] is None or str(g["prev_value"].iloc[0]) == "nan"
        # consecutive emitted values differ (that's the operator contract)
        vals = g["value"].tolist()
        assert all(a != b for a, b in zip(vals, vals[1:]))


def test_bucketed_join_elides_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key removes the Exchange — the
    co-located-join layout the 100 TB image⋈element join relies on."""
    a = spark.range(10000).withColumn("v", F.col("id") * 2)
    b = spark.range(10000).withColumn("w", F.col("id") * 3)
    a.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("bk_a")
    b.write.bucketBy(8, "id").sortBy("id").mode("overwrite").saveAsTable("bk_b")
    # hint merge: at toy sizes Catalyst would broadcast; the bucketed
    # layout's point is the sort-merge join with NO hash exchange
    j = spark.table("bk_a").hint("merge").join(spark.table("bk_b").hint("merge"), "id")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in plan, plan
    assert j.count() == 10000
    spark.sql("DROP TABLE bk_a")
    spark.sql("DROP TABLE bk_b")
