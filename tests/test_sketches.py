"""Space-Saving heavy hitters: exactness proof, bound refusal, config."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embulk_executor_mapreduce_spark.errors import EngineError
from embulk_executor_mapreduce_spark.operators.sketches import (
    HeavyHitterBoundError,
    heavy_hitters_exact,
)


def test_matches_plain_groupby_topk(spark):
    # Zipf: key i appears ~1000/i times over 60 distinct keys. The proof
    # bound is Σ_p min_counter_p ≤ n_partitions · n_p/capacity = N/capacity
    # ≈ 145 here, well under the 5th count (200) — so top-5 at capacity 32
    # is provably exact even though every partition's sketch saturates
    # (60 distinct > 32) and evictions really happen.
    rows = spark.range(60).select(
        F.col("id").alias("i"),
        F.explode(F.sequence(F.lit(1), (F.lit(1000) / (F.col("id") + 1)).cast("int"))).alias("rep"),
    ).select(F.concat(F.lit("key"), F.format_string("%02d", "i")).alias("key"))
    rows = rows.repartition(4)

    got = heavy_hitters_exact(rows, "key", k=5, capacity=32).collect()
    want = (
        rows.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("key"))
        .limit(5)
        .collect()
    )
    assert [(r["key"], r["n"]) for r in got] == [(r["key"], r["n"]) for r in want]


def test_bound_refusal_on_flat_distribution(spark):
    # 500 near-uniform keys, capacity 8: every partition saturates with
    # counters ~n_p/8, so the k-th count can't clear the miss bound — the
    # operator must REFUSE rather than return a possibly-wrong ranking
    flat = spark.range(5000).select(
        F.concat(F.lit("k"), (F.col("id") % 500)).alias("key")
    ).repartition(8)
    with pytest.raises(HeavyHitterBoundError, match="raise capacity"):
        heavy_hitters_exact(flat, "key", k=5, capacity=8)


def test_k_must_fit_capacity(spark):
    df = spark.range(10).select(F.col("id").cast("string").alias("key"))
    with pytest.raises(EngineError, match="k <= capacity"):
        heavy_hitters_exact(df, "key", k=100, capacity=10)


def test_null_keys_excluded(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], ["key"]
    ).repartition(2)
    got = heavy_hitters_exact(df, "key", k=2, capacity=8).collect()
    assert [(r["key"], r["n"]) for r in got] == [("a", 2), ("b", 1)]


def test_counts_are_exact_not_estimates(spark):
    # geometric skew (key i appears 4^i times, i=1..8) at capacity 4 forces
    # evictions — sketch ESTIMATES for surviving keys are inflated by
    # evicted mass, so equality with the true counts proves pass 2 recounts
    # and never trusts the sketch
    df = spark.range(1, 9).select(
        F.explode(
            F.sequence(F.lit(1), F.pow(F.lit(4), F.col("id")).cast("int"))
        ).alias("r"),
        F.concat(F.lit("t"), F.col("id")).alias("key"),
    ).select("key").repartition(2)
    got = {
        r["key"]: r["n"]
        for r in heavy_hitters_exact(df, "key", k=3, capacity=4).collect()
    }
    assert got == {"t8": 4**8, "t7": 4**7, "t6": 4**6}


def test_exactly_capacity_distinct_keys_is_provably_exact(spark):
    """distinct == capacity means the sketch never evicted — the miss bound
    is 0 and the result must be returned, not refused (r12 review finding:
    'sketch full' was conflated with 'sketch lossy')."""
    df = spark.range(8000).select(
        F.concat(F.lit("u"), (F.col("id") % 8)).alias("key")
    ).repartition(2)
    got = heavy_hitters_exact(df, "key", k=3, capacity=8).collect()
    assert [(r["key"], r["n"]) for r in got] == [
        ("u0", 1000), ("u1", 1000), ("u2", 1000),
    ]


def test_heap_rebuild_path_stays_exact(spark):
    """Force many Arrow batches (tiny maxRecordsPerBatch) so the lazy-heap
    accumulates stale entries and the 4x-capacity rebuild fires; the
    result must still be the exact top-k."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
    try:
        df = spark.range(4000).select(
            F.concat(
                F.lit("k"),
                F.format_string("%03d", (F.pmod(F.xxhash64("id"), 50)).cast("int")),
            ).alias("key")
        ).repartition(2)
        got = heavy_hitters_exact(df, "key", k=3, capacity=60).collect()
        want = (
            df.groupBy("key")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("key"))
            .limit(3)
            .collect()
        )
        assert [(r["key"], r["n"]) for r in got] == [
            (r["key"], r["n"]) for r in want
        ]
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_numeric_key_keeps_input_dtype(spark):
    """r12 advisor finding: the sketch's internal string cast must not leak —
    a bigint key_col comes back bigint, matching groupBy().count()."""
    df = spark.range(100).select((F.col("id") % 7).alias("key"))
    got = heavy_hitters_exact(df, "key", k=3, capacity=16)
    assert dict(got.dtypes)["key"] == "bigint"
    want = (
        df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("key").cast("string"))
        .limit(3)
        .collect()
    )
    assert [(r["key"], r["n"]) for r in got.collect()] == [
        (r["key"], r["n"]) for r in want
    ]
