"""aqe_cached_plan_scope semantics (r16 optimization round).

Two properties the round's review proved load-bearing:

1. The flag BINDS AT ``.persist()`` TIME — ``CacheManager.cacheQuery``
   decides at cache registration whether the cached plan compiles against
   an AQE-constrained clone, so a scope that opens after persist is inert.
   The merge sink's batch persist must therefore sit INSIDE the scope;
   asserted by spying the conf value at the moment the sink calls
   ``persist()``.

2. The scope is refcounted: concurrent merge writers (the sink's
   documented multi-writer mode) can interleave scopes non-LIFO; a naive
   save/restore would leave the flag stuck "true" session-wide — the exact
   pagerank cached-layout regression the scoping exists to prevent.
"""

from __future__ import annotations

from pyspark.sql.classic.dataframe import DataFrame

from embulk_executor_mapreduce_spark.session import (
    _AQE_CACHE_KEY,
    aqe_cached_plan_scope,
)


def test_scope_refcount_survives_interleaved_exits(spark):
    default = spark.conf.get(_AQE_CACHE_KEY)
    assert default == "false", "precondition: engine default is false"
    s1 = aqe_cached_plan_scope(spark)
    s2 = aqe_cached_plan_scope(spark)
    s1.__enter__()
    assert spark.conf.get(_AQE_CACHE_KEY) == "true"
    s2.__enter__()
    # non-LIFO: the FIRST scope exits while the second is still open
    s1.__exit__(None, None, None)
    assert spark.conf.get(_AQE_CACHE_KEY) == "true", (
        "flag must stay true while any scope is open"
    )
    s2.__exit__(None, None, None)
    assert spark.conf.get(_AQE_CACHE_KEY) == default, (
        "last exit must restore the pre-first-entry value"
    )


def test_merge_sink_persists_inside_scope(spark, tmp_path, monkeypatch):
    """The sink's batch ``persist()`` must run with the flag already true
    (binding happens at cache registration, not first compile)."""
    from embulk_executor_mapreduce_spark.sinks.writer import write_sink
    from embulk_executor_mapreduce_spark.spec import SinkSpec

    seen: list[str] = []
    orig = DataFrame.persist

    def spy(self, *a, **kw):
        seen.append(spark.conf.get(_AQE_CACHE_KEY))
        return orig(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "persist", spy)
    df = spark.range(50).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    spec = SinkSpec(
        type="parquet",
        path=str(tmp_path / "state"),
        mode="merge",
        merge_key=("k",),
        merge_buckets=4,
    )
    write_sink(df, spec)
    assert seen, "merge sink did not persist its batch"
    assert all(v == "true" for v in seen), (
        f"persist() ran with flag(s) {seen}; the scope must open before "
        "persist or the cached plan compiles AQE-constrained"
    )
    assert spark.conf.get(_AQE_CACHE_KEY) == "false", "scope not restored"
