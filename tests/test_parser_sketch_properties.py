"""Property batteries for the r12-continuation additions.

1. LTSV write→parse roundtrip: ANY representable record (strings without
   tab/newline, finite doubles, arbitrary longs) must survive the engine's
   ltsv sink → ltsv source trip bit-for-bit. Hypothesis drives the value
   space; one Spark roundtrip per example keeps the battery O(20 s).
2. Heavy hitters contract: for ANY key multiset and capacity ≥ k, the
   operator either returns EXACTLY the plain-groupBy top-k or raises
   HeavyHitterBoundError — a wrong ranking is the one outcome the design
   makes impossible, so the property hammers that directly.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from embulk_executor_mapreduce_spark.operators.sketches import (
    HeavyHitterBoundError,
    heavy_hitters_exact,
)
from embulk_executor_mapreduce_spark.plans.compiler import compile_pipeline
from embulk_executor_mapreduce_spark.sinks.writer import write_sink
from embulk_executor_mapreduce_spark.spec import load_spec

# strings the LTSV line format can carry: no tab/newline (loudly rejected
# by the sink), not the null_string '' (reads back as NULL by design)
_ltsv_str = st.text(
    alphabet=st.characters(blacklist_characters="\t\n\r", codec="utf-8"),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            _ltsv_str,
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_ltsv_roundtrip_property(spark, tmp_path_factory, rows):
    out = str(tmp_path_factory.mktemp("ltsv_prop"))
    df = spark.createDataFrame(rows, "id long, s string, v double")
    write_sink(
        df,
        load_spec(
            {"in": {"type": "task"}, "out": {"type": "ltsv", "path": out}}
        ).sink,
    )
    back = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "ltsv",
                    "path": out,
                    "columns": [
                        {"name": "id", "type": "long"},
                        {"name": "s", "type": "string"},
                        {"name": "v", "type": "double"},
                    ],
                },
                "out": {"type": "null"},
            }
        ),
    )
    assert {tuple(r) for r in back.collect()} == set(rows)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=30), min_size=1, max_size=400
    ),
    capacity=st.integers(min_value=3, max_value=40),
    data=st.data(),
)
def test_heavy_hitters_exact_or_refuses(spark, keys, capacity, data):
    k = data.draw(st.integers(min_value=1, max_value=capacity))
    df = spark.createDataFrame(
        [(f"k{x:02d}",) for x in keys], "key string"
    ).repartition(3)
    try:
        got = heavy_hitters_exact(df, "key", k=k, capacity=capacity).collect()
    except HeavyHitterBoundError:
        return  # refusal is always a legal outcome; wrong answers are not
    want = (
        df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("key"))
        .limit(k)
        .collect()
    )
    assert [(r["key"], r["n"]) for r in got] == [
        (r["key"], r["n"]) for r in want
    ]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**62),
            st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12),
            st.integers(min_value=-(2**31), max_value=2**31),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    )
)
def test_regex_roundtrip_property(spark, tmp_path_factory, rows):
    """format → regex-parse roundtrip: log lines rendered by the engine's
    own format_string must parse back bit-exact through the regex source."""
    import os

    d = str(tmp_path_factory.mktemp("rx_prop"))
    with open(os.path.join(d, "a.log"), "w") as f:
        for i, w, v in rows:
            f.write(f"{i} [{w}] v={v}\n")
    df = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "regex",
                    "path": d,
                    "options": {"pattern": r"^(\d+) \[(\w+)\] v=(-?\d+)$"},
                    "columns": [
                        {"name": "i", "type": "long"},
                        {"name": "w", "type": "string"},
                        {"name": "v", "type": "long"},
                    ],
                },
                "out": {"type": "null"},
            }
        ),
    )
    assert {tuple(r) for r in df.collect()} == set(rows)
