"""Streaming semantics + progress collection."""

from __future__ import annotations

from pyspark.sql import functions as F

from embulk_executor_mapreduce_spark.reports import ProgressMonitor
from embulk_executor_mapreduce_spark.streaming.ingest import (
    read_events_stream,
    run_stream_to_memory,
    streaming_dedup,
)

SF = "/root/testdata/sf0.001"


def test_streaming_dedup_matches_batch_distinct(spark):
    stream = streaming_dedup(read_events_stream(spark, SF)).select("event_id")
    out = run_stream_to_memory(stream, "t_dedup", output_mode="append")
    batch = spark.read.parquet(f"{SF}/events.parquet").select("event_id").distinct()
    assert out.count() == batch.count()


def test_stream_is_incremental(spark):
    df = read_events_stream(spark, SF)
    assert df.isStreaming


def test_progress_monitor_sees_tasks(spark):
    # needs a job slow enough to sample: sf0.1 lineitem with two shuffles
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    mon = ProgressMonitor(spark, interval=0.01)
    trail = mon.run(
        lambda: li.repartition(32, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .count()
    )
    assert trail.result > 0
    assert trail.wall_seconds > 0
    assert trail.samples, "no progress samples collected"
    assert all(s.num_tasks > 0 for s in trail.samples)
    assert not trail.any_failures()


def test_stateful_rollup_final_equals_batch(spark):
    """applyInPandasWithState rollup: last emission per user == batch agg."""
    from embulk_executor_mapreduce_spark.streaming.ingest import stateful_user_rollup

    out = run_stream_to_memory(
        stateful_user_rollup(read_events_stream(spark, SF)),
        "t_rollup",
        output_mode="update",
    )
    # keep the LAST emission per user (multiple micro-batches re-emit)
    final = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    assert final.exceptAll(batch).count() == 0
    assert batch.exceptAll(final).count() == 0
