"""Adversarial cross-engine battery for the exactmath discipline: the same
values pushed through Spark's d_round/exact_sum AND DuckDB's floor-form SQL
must agree bit-for-bit — including the .xx5 boundary values that round(sum())
flipped in round 1, and magnitudes where doubles get sparse."""

from __future__ import annotations

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from embulk_executor_mapreduce_spark.exactmath import (
    d_round,
    exact_avg,
    exact_sum,
    sql_d_round,
    sql_exact_avg,
    sql_exact_sum,
)
from embulk_executor_mapreduce_spark.operators.partitioning import bucket_expr


def _adversarial_values() -> list[float]:
    rng = random.Random(20260813)
    vals: list[float] = []
    # exact 2-decimal money (the stored format): dense around rounding bounds
    vals += [round(k / 100, 2) for k in range(-500, 500, 7)]
    # exact half-cent boundaries k/200 — the .xx5 class that flips round()
    vals += [k / 200 for k in range(-1999, 2000, 13)]
    # quarter/eighth-cent dyadics (exactly representable halves at digit 3/4)
    vals += [k / 400 for k in range(-799, 800, 11)]
    vals += [k / 1600 for k in range(-1599, 1600, 17)]
    # large magnitudes: revenue-sum scale where %.6g lost digits
    vals += [round(rng.uniform(1e6, 5e8), 2) for _ in range(200)]
    # random doubles with full precision (not decimal-representable)
    vals += [rng.uniform(-1e4, 1e4) for _ in range(300)]
    return vals


@pytest.mark.parametrize("digits", [2, 4, 6])
def test_d_round_matches_duckdb_bit_for_bit(spark, digits):
    vals = _adversarial_values()
    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, x double")
    got = {
        r.i: r.y
        for r in sdf.select("i", d_round(F.col("x"), digits).alias("y")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(vals)))
    want = dict(
        con.execute(f"SELECT i, {sql_d_round('x', digits)} FROM t").fetchall()
    )
    diffs = {
        i: (got[i], want[i], vals[i])
        for i in got
        if got[i] != want[i] and not (math.isnan(got[i]) and math.isnan(want[i]))
    }
    assert not diffs, f"{len(diffs)} mismatches, e.g. {list(diffs.items())[:3]}"


@pytest.mark.parametrize("scale", [100, 10000])
def test_exact_sum_and_avg_match_duckdb(spark, scale):
    """Grouped sums/avgs over adversarial values: Spark's parallel partial
    aggregation vs DuckDB's sequential sum must agree exactly (the integer
    partials make summation order irrelevant)."""
    vals = _adversarial_values()
    rows = [(i % 7, v) for i, v in enumerate(vals)]
    sdf = spark.createDataFrame(rows, "g long, x double").repartition(13)
    got = {
        (r.g): (r.s, r.a)
        for r in sdf.groupBy("g")
        .agg(
            exact_sum(F.col("x"), scale=scale).alias("s"),
            exact_avg(F.col("x"), scale=scale).alias("a"),
        )
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g BIGINT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        g: (s, a)
        for g, s, a in con.execute(
            f"SELECT g, {sql_exact_sum('x', scale)}, {sql_exact_avg('x', scale)} "
            "FROM t GROUP BY g"
        ).fetchall()
    }
    assert got == want


def test_exact_sum_is_partitioning_invariant(spark):
    """The q3 failure mode directly: identical data, different physical
    partitionings → identical aggregate doubles."""
    vals = _adversarial_values()
    rows = [(i % 5, v) for i, v in enumerate(vals)]
    outs = []
    for nparts in (1, 4, 32):
        sdf = spark.createDataFrame(rows, "g long, x double").repartition(nparts)
        outs.append(
            sorted(
                (r.g, r.s)
                for r in sdf.groupBy("g")
                .agg(exact_sum(F.col("x"), scale=10000).alias("s"))
                .collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_bucket_floor_div_matches_python_reference(spark):
    """Exact integer bucketing vs Python's arbitrary-precision floordiv over
    the full long range (incl. nano magnitudes beyond 2^53 and negatives)."""
    rng = random.Random(7)
    longs = (
        [rng.randrange(-(2**62), 2**62) for _ in range(500)]
        + [k for k in range(-10, 10)]
        + [2**53 - 1, 2**53, 2**53 + 1, -(2**53) - 1]
    )
    df = spark.createDataFrame([(i, v) for i, v in enumerate(longs)], "i long, t long")
    out = df.select(
        "i", bucket_expr(df, "t", "hour", unix_timestamp_unit="nano").alias("b")
    )
    got = {r.i: r.b for r in out.collect()}
    for i, v in enumerate(longs):
        want = (v // 10**9) // 3600  # python floordiv == documented semantics
        assert got[i] == want, (v, got[i], want)
