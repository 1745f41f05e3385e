"""Property tests for the non-oracle operators: SimHash locality, LSH recall,
and the dedup survivor invariants."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from embulk_executor_mapreduce_spark.operators.dedup import (
    exact_dedup,
    simhash64,
)
from embulk_executor_mapreduce_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucket_topk,
)

SF = "/root/testdata/sf0.001"


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_simhash_locality(spark):
    """Near-identical docs get near-identical simhashes; disjoint docs don't."""
    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = [
        Row(doc_id=1, text=base + "alpha beta"),
        Row(doc_id=2, text=base + "alpha gamma"),  # near-dup of 1
        Row(doc_id=3, text="completely different vocabulary entirely " * 10),
    ]
    got = {r.doc_id: r.simhash for r in simhash64(spark.createDataFrame(docs), "text", "doc_id").collect()}
    near = _hamming(got[1], got[2])
    far = _hamming(got[1], got[3])
    assert near < far, f"simhash locality violated: near={near} far={far}"
    assert near <= 16


def test_exact_dedup_survivors(spark):
    docs = [
        Row(doc_id=10, text="aaa"),
        Row(doc_id=11, text="aaa"),
        Row(doc_id=12, text="bbb"),
    ]
    out = exact_dedup(spark.createDataFrame(docs), "text", "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [10, 12]


def test_lsh_recall_vs_bruteforce(spark):
    """The LSH top-k must recover a reasonable fraction of true neighbors —
    and every returned neighbor's cos_sim must match brute force exactly."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    brute = brute_force_topk(emb, k=5)
    approx = lsh_bucket_topk(emb, k=5)
    b = {(r.query_id, r.cand_id): r.cos_sim for r in brute.collect()}
    a = {(r.query_id, r.cand_id): r.cos_sim for r in approx.collect()}
    # scores for overlapping pairs identical
    for k_ in set(a) & set(b):
        assert abs(a[k_] - b[k_]) < 1e-9
    recall = len(set(a) & set(b)) / len(b)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_approx_count_distinct_bounds(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = ev.select("user_id").distinct().count()
    approx = ev.agg(F.approx_count_distinct("user_id").alias("a")).collect()[0].a
    assert abs(approx - exact) / exact < 0.15
