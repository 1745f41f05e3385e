"""Scale-safety guards for the round-2 fixes (VERDICT.md "what's wrong"):
pair-count bounds under adversarial corpora, corpus-independent broadcast
sizes, retry-stable salting, and exact bucket math beyond 2^53."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from embulk_executor_mapreduce_spark.operators.dedup import (
    embedding_neardup,
    jaccard_pairs,
    neardup_sign_dims,
)
from embulk_executor_mapreduce_spark.operators.partitioning import (
    bucket_expr,
    salt_expr,
)
from embulk_executor_mapreduce_spark.operators.similarity import ivf_centroids, ivf_topk


# ---------------------------------------------------------------------------
# jaccard_pairs max_doc_freq: the hot-shingle cap
# ---------------------------------------------------------------------------


def _boilerplate_corpus(spark, n_docs: int = 60):
    """Every doc shares one boilerplate sentence (a hot shingle in all docs)
    plus a unique tail — uncapped, the self-join pairs all docs with all."""
    rows = [
        (i, f"all rights reserved worldwide unique{i} tail{i} words{i} here{i}")
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_cap_bounds_pair_count(spark):
    docs = _boilerplate_corpus(spark)
    uncapped = jaccard_pairs(docs, "text", "doc_id", threshold=0.0)
    capped = jaccard_pairs(docs, "text", "doc_id", threshold=0.0, max_doc_freq=5)
    # the boilerplate shingles pair every doc with every other: C(60,2)
    assert uncapped.count() == 60 * 59 // 2
    # with df(shingle) <= 5 enforced, the all-docs shingles are dropped and
    # the unique tails pair nothing
    assert capped.count() == 0


def test_jaccard_cap_stage_in_plan(spark):
    """The cap must appear as a pre-join stage (a df-filtered shingle join),
    not a post-hoc filter on pairs — otherwise the O(n²) join still runs."""
    docs = _boilerplate_corpus(spark, n_docs=10)
    capped = jaccard_pairs(docs, "text", "doc_id", threshold=0.0, max_doc_freq=5)
    plan = capped._jdf.queryExecution().optimizedPlan().toString()
    # the frequency aggregate over shingles feeds a join BELOW the pair join
    assert plan.count("Aggregate") >= 3  # freq count + sizes + pair count
    assert "__df" in plan or "dfreq" in plan or "count" in plan


# ---------------------------------------------------------------------------
# IVF: fixed-k centroid table (corpus-independent broadcast)
# ---------------------------------------------------------------------------


def _vec_corpus(spark, n: int, dim: int = 8):
    rows = [
        (i, [((i * 31 + j * 7) % 13 - 6) / 6.0 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_centroid_count_is_corpus_independent(spark):
    k = 16
    for n in (100, 400):
        base = _vec_corpus(spark, n).select(
            "vec_id", F.col("embedding").alias("v")
        ).withColumn("nrm", F.lit(1.0))
        cents = ivf_centroids(base, "vec_id", k)
        assert cents.count() == k, f"centroids must stay {k} at corpus size {n}"


def test_ivf_runs_on_small_corpus(spark):
    out = ivf_topk(_vec_corpus(spark, 120), n_centroids=16, k=3)
    rows = out.collect()
    assert {r.query_id for r in rows} <= {0, 1, 2, 3}
    assert all(r.cand_id != r.query_id for r in rows)


# ---------------------------------------------------------------------------
# embedding_neardup: sign_dims sized from the corpus
# ---------------------------------------------------------------------------


def test_neardup_sign_dims_scales_with_corpus():
    assert neardup_sign_dims(1_000) == 4  # floor
    assert neardup_sign_dims(100_000, target_bucket_docs=256) == 9
    assert neardup_sign_dims(10_000_000, target_bucket_docs=256) == 16
    assert neardup_sign_dims(10**12, target_bucket_docs=256) == 24  # cap


def test_neardup_auto_uses_corpus_count(spark):
    vecs = _vec_corpus(spark, 300)
    out = embedding_neardup(vecs, threshold=-1.0, target_bucket_docs=64)
    # 300/64 → ceil(log2(4.7)) = 3 → clamped to 4 bits = 16 buckets; with
    # 8-dim sign patterns the join must run and produce in-bucket pairs only
    assert out.count() > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# levenshtein blocking: composed key bounds the biggest block
# ---------------------------------------------------------------------------


def test_levenshtein_blocking_pair_bound(spark):
    from embulk_executor_mapreduce_spark import catalog

    df = catalog.entries()["levenshtein_near_names"].fn(
        spark, "/root/testdata/sf0.001"
    )
    p = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    n = p.count()
    brands = p.select("p_brand").distinct().count()
    # composed key must beat brand-only blocking by a wide margin
    brand_only_pairs = n * (n - 1) / (2 * brands)
    assert df.count() < brand_only_pairs / 2


# ---------------------------------------------------------------------------
# salt determinism (retry safety) + exact bucket math beyond 2^53
# ---------------------------------------------------------------------------


def test_salt_is_content_deterministic(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 7 % 97).alias("k")
    )
    a = df.select("id", salt_expr(16, ["id", "k"]).alias("s1"))
    b = df.select("id", salt_expr(16, ["id", "k"]).alias("s2"))
    joined = a.join(b, "id")
    assert joined.filter(F.col("s1") != F.col("s2")).count() == 0
    # and it actually spreads: >= half the salt space used
    assert a.select("s1").distinct().count() >= 8


def test_salt_survives_repartition(spark):
    """Same rows, different physical layout → same salts (the
    monotonically_increasing_id version failed exactly this)."""
    df = spark.range(500).select(F.col("id"), (F.col("id") % 13).alias("k"))
    s1 = sorted(
        (r.id, r.s)
        for r in df.select("id", salt_expr(8, ["id", "k"]).alias("s")).collect()
    )
    s2 = sorted(
        (r.id, r.s)
        for r in df.repartition(7)
        .select("id", salt_expr(8, ["id", "k"]).alias("s"))
        .collect()
    )
    assert s1 == s2


def test_bucket_math_exact_for_nano_longs(spark):
    """Nano-unit longs exceed 2^53: double division misplaces rows within a
    few hundred ns of an hour boundary; the exact integer path must not."""
    hour_ns = 3600 * 10**9
    boundary = 470_000 * hour_ns  # ≈ 1.69e18 > 2^53
    rows = [
        (1, boundary - 1),
        (2, boundary),
        (3, boundary + 1),
        (4, boundary + hour_ns - 1),
        (5, boundary + hour_ns),
    ]
    df = spark.createDataFrame(rows, "id long, t long")
    out = df.select(
        "id", bucket_expr(df, "t", "hour", unix_timestamp_unit="nano").alias("b")
    )
    got = {r.id: r.b for r in out.collect()}
    assert got[1] == 470_000 - 1
    assert got[2] == got[3] == got[4] == 470_000
    assert got[5] == 470_001


def test_bucket_math_floors_negative_epochs(spark):
    """Documented divergence from the reference (Java truncation): pre-1970
    seconds floor toward -inf so they land in their own wall-clock hour."""
    df = spark.createDataFrame([(1, -1), (2, -3600), (3, -3601)], "id long, t long")
    out = df.select(
        "id", bucket_expr(df, "t", "hour", unix_timestamp_unit="sec").alias("b")
    )
    got = {r.id: r.b for r in out.collect()}
    assert got[1] == -1 and got[2] == -1 and got[3] == -2


def test_spread_narrow_widens_only_narrow_input(spark):
    """spread_narrow: a 1-partition frame fans out to cluster parallelism, an
    already-wide frame passes through untouched (the 100 TB case — no
    gratuitous full-payload shuffle), and the spread is deterministic (hash
    of row content, not round-robin), so re-evaluation yields identical
    partition assignment."""
    from embulk_executor_mapreduce_spark.operators.partitioning import spread_narrow

    n_par = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    spread = spread_narrow(narrow, "id")
    assert spread.rdd.getNumPartitions() == n_par
    assert sorted(r.id for r in spread.collect()) == list(range(1000))

    wide = spark.range(1000).repartition(n_par + 4)
    assert spread_narrow(wide, "id") is wide

    a = [set(p) for p in spread.rdd.glom().map(lambda rows: [r.id for r in rows]).collect()]
    b = [set(p) for p in spread.rdd.glom().map(lambda rows: [r.id for r in rows]).collect()]
    assert a == b
