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
    # None = explicitly uncapped (test-only; the default is the corpus-
    # sized "auto" cap, covered below)
    uncapped = jaccard_pairs(docs, "text", "doc_id", threshold=0.0, max_doc_freq=None)
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


# ---------------------------------------------------------------------------
# semantic_dedup: corpus-sized k + hot-cluster AQE skew handling (r5)
# ---------------------------------------------------------------------------

from embulk_executor_mapreduce_spark.operators.dedup import (  # noqa: E402
    minhash_candidates,
    semantic_dedup,
    semantic_dedup_k,
)


def test_semantic_dedup_k_scales_with_corpus():
    """VERDICT r4: a FIXED k leaves the within-cluster pairwise join
    O((n/k)²) — k must grow with the corpus so expected occupancy (and the
    per-cluster pair cost) stays constant."""
    assert semantic_dedup_k(0) == 16
    assert semantic_dedup_k(500) == 16  # floor
    assert semantic_dedup_k(16 * 1024) == 16  # last corpus the floor covers
    assert semantic_dedup_k(1_000_000) == 977
    assert semantic_dedup_k(50_000_000) == 48_829
    assert semantic_dedup_k(10**12) == 65_536  # cap: broadcast table bound
    # doubling the corpus ~doubles k above the floor → occupancy constant
    assert 1.9 < semantic_dedup_k(2_000_000) / semantic_dedup_k(1_000_000) < 2.1


def test_semantic_dedup_oracle_k_pin():
    """The catalog query runs auto-k while its static oracle is unrolled at
    k=16 — valid ONLY while auto-k resolves to 16 at driver/bench scales.
    This pin turns silent testdata growth into a loud failure."""
    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        n = duckdb.sql(
            f"select count(*) from '/root/testdata/sf{sf}/embeddings.parquet'"
        ).fetchone()[0]
        assert semantic_dedup_k(n) == 16, (
            f"sf{sf}: embeddings grew past the k=16 floor — re-unroll the "
            "semantic_dedup_embeddings oracle with the new k"
        )


def _with_conf(spark, overrides):
    saved = {}
    for k, v in overrides.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    return saved


def _restore_conf(spark, saved):
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


#: toy-scale AQE knobs: at sf-test sizes no partition crosses the 256 MB
#: production skew threshold, so the tests shrink it to make the SAME
#: runtime mechanism observable; production clusters keep the defaults
_SKEW_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the SMJ path
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2048",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1024",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def test_semantic_dedup_hot_cluster_aqe_skew_split(spark):
    """One semantic cluster holding ~95% of the corpus (boilerplate
    embeddings): the within-cluster self-join's hot partition must be SPLIT
    by AQE skew-join at runtime — the plan shows ``AQEShuffleRead skewed``
    on both join sides — rather than serializing the cluster onto one task.
    This replaces SCALING §10's prose caveat with measured behavior."""
    saved = _with_conf(spark, _SKEW_CONF)
    try:
        dim = 8
        rows = []
        for i in range(400):
            if i >= 20:  # 380 near-identical docs → one hot cluster
                rows.append(
                    (i, [1.0 + (i % 7) * 1e-4] + [0.01 * (i % 3)] * (dim - 1))
                )
            else:
                rows.append(
                    (i, [((i * 31 + j * 7) % 13 - 6) / 6.0 for j in range(dim)])
                )
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = semantic_dedup(df, k=8, iters=1, threshold_micro=900_000)
        survivors = out.collect()
        # near-identical hot-cluster docs dedup down to a handful
        assert 0 < len(survivors) < 50
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert plan.count("AQEShuffleRead skewed") >= 2, plan
    finally:
        _restore_conf(spark, saved)


def test_minhash_hot_band_aqe_skew_split(spark):
    """Lexical twin: every doc sharing one boilerplate band key (identical
    text) concentrates the band self-join on a single (band, band_key)
    partition; AQE must split it the same way."""
    saved = _with_conf(spark, _SKEW_CONF)
    try:
        docs = spark.createDataFrame(
            [(i, "all rights reserved worldwide do not redistribute")
             for i in range(200)],
            "doc_id long, text string",
        )
        pairs = minhash_candidates(docs, "text", "doc_id")
        assert pairs.count() == 200 * 199 // 2  # identical docs all pair
        pairs = minhash_candidates(docs, "text", "doc_id")
        pairs.collect()
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "AQEShuffleRead skewed" in plan, plan
    finally:
        _restore_conf(spark, saved)


def test_semantic_dedup_auto_k_matches_explicit(spark):
    """k=None (corpus-sized) must be exactly the explicit-k pipeline at the
    resolved k — same survivors, bit for bit."""
    vecs = _vec_corpus(spark, 120)
    auto = {(r.vec_id, r.cid) for r in
            semantic_dedup(vecs, iters=1, threshold_micro=990_000).collect()}
    expl = {(r.vec_id, r.cid) for r in
            semantic_dedup(vecs, k=semantic_dedup_k(120), iters=1,
                           threshold_micro=990_000).collect()}
    assert auto == expl and len(auto) > 0


# ---------------------------------------------------------------------------
# two-level semantic dedup: √-scale sizing + leaf invariants (r5)
# ---------------------------------------------------------------------------

from embulk_executor_mapreduce_spark.operators.dedup import (  # noqa: E402
    semantic_dedup_two_level,
    two_level_k,
)


def test_two_level_k_covers_past_flat_cap():
    """Per-level k grows with √corpus, so the LEAF count tracks n/target far
    past the flat cap: at 10^12 docs each level needs only ~31k centroids
    (broadcastable), where flat-k saturated at 65536 clusters total."""
    assert two_level_k(0) == 2
    assert two_level_k(500) == 2  # floor
    assert two_level_k(1_000_000) == 32  # 32*32=1024 leaves ~ n/target
    assert two_level_k(10**12) == 31_250  # < 65536: still broadcastable
    # leaf occupancy stays ~target across 6 orders of magnitude
    for n in (10**6, 10**9, 10**12):
        k = two_level_k(n)
        assert 0.5 <= n / (k * k) / 1024 <= 2.0, n


def test_two_level_semantic_dedup_leaf_invariants(spark):
    """Within every surviving leaf no over-threshold pair remains, survivors
    are min-id first-wins, and the auto-sized call equals the explicit call
    at the resolved per-level k."""
    vecs = _vec_corpus(spark, 160)
    out = semantic_dedup_two_level(
        vecs, coarse_k=3, sub_k=2, iters=1, threshold_micro=990_000
    )
    rows = out.collect()
    assert 0 < len(rows) <= 160
    assert {len(r) for r in rows} == {3}  # (vec_id, cell, scid)
    # re-run: deterministic
    again = semantic_dedup_two_level(
        vecs, coarse_k=3, sub_k=2, iters=1, threshold_micro=990_000
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # auto == explicit at the resolved k (two_level_k(160) == 2)
    auto = semantic_dedup_two_level(vecs, iters=1, threshold_micro=990_000)
    expl = semantic_dedup_two_level(
        vecs, coarse_k=two_level_k(160), sub_k=two_level_k(160),
        iters=1, threshold_micro=990_000,
    )
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, expl.collect()))


def test_two_level_no_surviving_over_threshold_pair(spark):
    """Hard invariant: among survivors sharing a leaf, every pairwise cosine
    is strictly below the threshold (the dedup predicate replayed over the
    output must be empty)."""
    import itertools
    import math as m

    vecs = _vec_corpus(spark, 120)
    thresh = 900_000
    out = semantic_dedup_two_level(
        vecs, coarse_k=2, sub_k=2, iters=1, threshold_micro=thresh
    )
    vec_map = {r.vec_id: r.embedding for r in vecs.collect()}
    by_leaf = {}
    for r in out.collect():
        by_leaf.setdefault((r.cell, r.scid), []).append(r.vec_id)
    checked = 0
    for ids in by_leaf.values():
        for a, b in itertools.combinations(sorted(ids), 2):
            va, vb = vec_map[a], vec_map[b]
            dot_ = sum(x * y for x, y in zip(va, vb))
            na = m.sqrt(sum(x * x for x in va))
            nb = m.sqrt(sum(x * x for x in vb))
            assert m.floor(dot_ / (na * nb) * 1_000_000 + 0.5) < thresh, (a, b)
            checked += 1
    assert checked > 0  # the invariant actually bit on something


def test_jaccard_auto_cap_sized_from_corpus(spark):
    """r5: the default max_doc_freq="auto" sizes the stop-shingle cap from
    the corpus count (SCALING §10's "choose per-corpus" caveat made
    automatic) — the all-docs boilerplate shingles exceed the auto cap and
    pair nothing, with no explicit parameter."""
    from embulk_executor_mapreduce_spark.operators.dedup import (
        jaccard_max_doc_freq,
        jaccard_pairs,
    )

    assert jaccard_max_doc_freq(0) == 8
    assert jaccard_max_doc_freq(500) == 8  # floor
    assert jaccard_max_doc_freq(1_000_000) == 10_000
    # cap tracks the corpus: constant FRACTION, so the pair bound per
    # shingle grows as (frac·n)² only for genuinely common shingles
    assert jaccard_max_doc_freq(2_000_000) == 2 * jaccard_max_doc_freq(1_000_000)

    docs = _boilerplate_corpus(spark, n_docs=60)
    assert jaccard_pairs(docs, "text", "doc_id", threshold=0.0).count() == 0


# ---------------------------------------------------------------------------
# planning_row_count: auto-parameter heuristics must not cost a corpus scan
# on file-backed inputs (VERDICT r5 item 4)
# ---------------------------------------------------------------------------


def test_parquet_scan_row_count_metadata_only(spark):
    """Footer metadata path: exact on bare and column-pruned parquet scans,
    refuses (None) whenever the plan could change the row count."""
    from embulk_executor_mapreduce_spark.plans.inspect import (
        parquet_scan_row_count,
        planning_row_count,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    true_n = df.count()
    assert parquet_scan_row_count(df) == true_n
    assert parquet_scan_row_count(df.select("doc_id", "text")) == true_n
    # count-changing plans must fall through
    assert parquet_scan_row_count(df.filter("doc_id > 5")) is None
    assert parquet_scan_row_count(df.groupBy("source").count()) is None
    assert parquet_scan_row_count(df.limit(3)) is None
    mem = spark.createDataFrame([(1,)], "a int")
    assert parquet_scan_row_count(mem) is None
    # resolution order: caller > metadata > count()
    assert planning_row_count(df, n_rows=7) == 7
    assert planning_row_count(df) == true_n
    assert planning_row_count(mem) == 1  # count() fallback


def test_auto_params_no_count_job_on_file_backed_input(spark, monkeypatch):
    """The job-count guard: with DataFrame.count poisoned, every auto-sized
    operator must still PLAN against a file-backed corpus — proof the extra
    aggregate-only scan is gone (footer metadata serves the scalar). An
    in-memory frame still falls back to count() (also asserted)."""
    from pyspark.sql import DataFrame

    from embulk_executor_mapreduce_spark.operators.dedup import (
        semantic_dedup,
        semantic_dedup_two_level,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def boom(self):
        raise AssertionError("auto path ran a count() job on a file-backed input")

    monkeypatch.setattr(DataFrame, "count", boom)
    # plan construction must succeed without any count job. (semantic_dedup
    # trains eagerly — that's the measured k-means cost, not a count.)
    jaccard_pairs(docs.limit(0).union(docs), "text", "doc_id", n_rows=500)
    jaccard_pairs(docs, "text", "doc_id")
    embedding_neardup(embs)
    semantic_dedup(embs, iters=1)
    semantic_dedup_two_level(embs, iters=1)
    monkeypatch.undo()
    # in-memory inputs still resolve via count()
    mem = spark.createDataFrame(
        [(i, f"text {i} unique words here {i}") for i in range(10)],
        "doc_id long, text string",
    )
    assert jaccard_pairs(mem, "text", "doc_id", threshold=0.0).count() == 0


def test_pagerank_caller_supplied_node_count(spark):
    """pagerank(n_nodes=...) skips the planning count and produces
    bit-identical ranks to the counted path."""
    from embulk_executor_mapreduce_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i % 13, (i * 5 + 2) % 13) for i in range(100)], "src long, dst long"
    )
    counted = sorted(map(tuple, pagerank(edges, iters=2).collect()))
    supplied = sorted(map(tuple, pagerank(edges, iters=2, n_nodes=13).collect()))
    assert counted == supplied


def test_kmeans_unsampled_training_guardrail(spark):
    """VERDICT r5 item 6: an oversized UNFILTERED kmeans_train warns loudly
    (naming the hash-sample recipe); a train_filter or an explicit
    max_unsampled_rows=None silences it; the default threshold never fires
    at test scale."""
    import warnings as w

    from embulk_executor_mapreduce_spark.operators.similarity import kmeans_train

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    with pytest.warns(ResourceWarning, match="hash-sample"):
        kmeans_train(embs, "vec_id", "embedding", k=4, iters=1,
                     max_unsampled_rows=100)
    with w.catch_warnings():
        w.simplefilter("error", ResourceWarning)
        # a sampled train over the same oversized input is the blessed path
        kmeans_train(
            embs, "vec_id", "embedding", k=4, iters=1,
            train_filter=F.pmod(F.xxhash64("vec_id"), F.lit(2)) == 0,
            max_unsampled_rows=100,
        )
        # deliberate full train opts out
        kmeans_train(embs, "vec_id", "embedding", k=4, iters=1,
                     max_unsampled_rows=None)
        # default threshold (2M) is far above any test corpus
        kmeans_train(embs, "vec_id", "embedding", k=4, iters=1)
