"""Persisted BM25 postings index (r14, VERDICT r13 item 1): the lexical
twin of the r13 IVF-PQ index — term-bucketed tombstone-capable postings +
per-version stats deltas as standing state, probe-only scoring bit-equal
to the inline scorer, CDC-shaped update/delete increments."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from embulk_executor_mapreduce_spark.operators.search import (
    bm25_index_build,
    bm25_index_delta,
    bm25_topk,
    bm25_topk_indexed,
)

TERMS = ("alpha", "gamma", "zeta")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _corpus(spark, n=40):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    return _docs(
        spark,
        [
            (i, " ".join(words[j % 6] for j in range(i, i + 3 + i % 5)))
            for i in range(n)
        ],
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_indexed_matches_inline_bitwise(spark, tmp_path):
    corpus = _corpus(spark)
    root = str(tmp_path / "ix")
    bm25_index_build(corpus, root, merge_buckets=8)
    got = bm25_topk_indexed(spark, root, TERMS, k=7)
    want = bm25_topk(corpus, TERMS, k=7)
    assert _rows(got) == _rows(want) and got.count() == 7


def test_incremental_build_equals_batch(spark, tmp_path):
    """Two insert increments produce the index (and stats) one batch
    build produces — scoring over both is bit-identical."""
    corpus = _corpus(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    bm25_index_build(corpus, a, merge_buckets=8)
    bm25_index_build(
        corpus.filter(F.col("doc_id") % 2 == 0), b, merge_buckets=8, version=1
    )
    bm25_index_build(
        corpus.filter(F.col("doc_id") % 2 == 1), b, merge_buckets=8, version=2
    )
    assert _rows(bm25_topk_indexed(spark, b, TERMS, k=7)) == \
        _rows(bm25_topk_indexed(spark, a, TERMS, k=7))


def test_update_and_delete_increments_track_corpus(spark, tmp_path):
    """The serving contract under churn: after an update (term set and
    length change) and a delete flow through bm25_index_delta, probe-only
    scoring equals the inline scorer over the CURRENT corpus."""
    base = _corpus(spark)
    root = str(tmp_path / "ix")
    bm25_index_build(base, root, merge_buckets=8, version=1)
    # v2: doc 0 rewritten (drops its old terms, new length), doc 1 deleted
    upd = _docs(spark, [(0, "zeta zeta nu")])
    pre = base.filter(F.col("doc_id").isin(0, 1))
    bm25_index_delta(upd, pre, root, version=2, merge_buckets=8)
    current = (
        base.filter(~F.col("doc_id").isin(0, 1)).unionByName(upd)
    )
    got = bm25_topk_indexed(spark, root, TERMS, k=10)
    want = bm25_topk(current, TERMS, k=10)
    assert _rows(got) == _rows(want)
    # the dropped pair is a tombstone, invisible to the probe
    ids = {r.doc_id for r in got.collect()}
    assert 1 not in ids


def test_delta_redelivery_is_idempotent(spark, tmp_path):
    base = _corpus(spark)
    root = str(tmp_path / "ix")
    bm25_index_build(base, root, merge_buckets=8, version=1)
    upd = _docs(spark, [(3, "alpha alpha alpha")])
    pre = base.filter(F.col("doc_id") == 3)
    bm25_index_delta(upd, pre, root, version=2, merge_buckets=8)
    before = _rows(bm25_topk_indexed(spark, root, TERMS, k=10))
    bm25_index_delta(upd, pre, root, version=2, merge_buckets=8)  # replay
    assert _rows(
        bm25_topk_indexed(spark, root, TERMS, k=10)
    ) == before


def test_probe_opens_only_query_term_buckets(spark, tmp_path):
    """The inverted-list read: with term bucketing, the probe's resolved
    file paths cover only the query terms' bucket ids — a proper subset
    of the committed buckets for a narrow query."""
    import json

    from embulk_executor_mapreduce_spark.sinks.writer import merge_bucket_ids

    corpus = _corpus(spark, n=60)
    root = str(tmp_path / "ix")
    bm25_index_build(corpus, root, merge_buckets=16)
    state = os.path.join(root, "postings")
    with open(os.path.join(state, "_CURRENT")) as f:
        v = json.load(f)["version"]
    with open(os.path.join(state, "_manifests", f"v{v}.json")) as f:
        committed = set(json.load(f)["buckets"])
    want_ids = {str(b) for b in merge_bucket_ids(spark, ["alpha"], 16)}
    probe = bm25_topk_indexed(spark, root, ("alpha",), k=5)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # every committed bucket NOT holding 'alpha' stays unopened. Digit
    # boundary required: "__mbd=1" is a PREFIX of "__mbd=11" (the probe's
    # actual bucket) — a latent substring bug the r16
    # maxMetadataStringLength bump exposed the moment the full path list
    # stopped being truncated out of the plan string.
    import re

    for b in committed - want_ids:
        assert not re.search(rf"__mbd={b}(?!\d)", plan), (
            f"bucket {b} opened: {plan[:2000]}"
        )
    # the positive side: the probe's own buckets ARE the ones listed
    for b in want_ids:
        assert re.search(rf"__mbd={b}(?!\d)", plan), f"bucket {b} missing"
    assert len(committed) > len(want_ids)  # the subset is proper
    assert probe.count() == 5


def test_batch_matches_per_query_probes_bitwise(spark, tmp_path):
    """r14 batch retrieval: each query's ranking in the one-pass batch
    equals its own single-query probe bit-for-bit (shared contrib +
    identical df/N/sumdl derivations)."""
    from embulk_executor_mapreduce_spark.operators.search import (
        bm25_batch_topk_indexed,
    )

    corpus = _corpus(spark, n=50)
    root = str(tmp_path / "ix")
    bm25_index_build(corpus, root, merge_buckets=8)
    queries = {0: ("alpha", "gamma"), 1: ("zeta",), 2: ("beta", "delta", "epsilon")}
    batch = bm25_batch_topk_indexed(spark, root, queries, k=6)
    for q, terms in queries.items():
        got = sorted(
            (r.doc_id, r.bm25)
            for r in batch.filter(F.col("query_id") == q).collect()
        )
        want = sorted(
            map(tuple, bm25_topk_indexed(spark, root, terms, k=6).collect())
        )
        assert got == want, f"query {q} diverged"


def test_rrf_fusion_semantics(spark):
    """RRF (SIGIR 2009): a doc ranked well by BOTH inputs beats a doc
    ranked top by only one; micro-unit floors are exact; ties break by
    id."""
    from embulk_executor_mapreduce_spark.operators.search import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    sem = spark.createDataFrame(
        [(20, 1), (40, 2), (10, 3)], "doc_id long, rank int"
    )
    out = {r.doc_id: r.rrf for r in rrf_fuse([lex, sem], k=4).collect()}
    # doc 20: 1/62 + 1/61; doc 10: 1/61 + 1/63 — both dual-ranked docs
    # beat the single-ranked 30 (1/63) and 40 (1/62)
    assert out[20] > out[10] > out[40] > out[30]
    assert out[20] == (1_000_000 // 62 + 1_000_000 // 61) / 1_000_000.0


def test_oov_terms_rank_zero_docs_not_crash(spark, tmp_path):
    """r15 advisor finding (medium): a query whose terms all hash to
    bucket ids absent from the committed manifest is a legitimate request
    that ranks ZERO documents — read_merge_state(buckets=[absent...])
    must return an empty frame with the committed schema, not raise."""
    from embulk_executor_mapreduce_spark.operators.search import (
        bm25_batch_topk_indexed,
    )

    corpus = _corpus(spark)
    root = str(tmp_path / "ix")
    bm25_index_build(corpus, root, merge_buckets=64)
    # all-OOV single query: empty ranked frame, schema intact
    got = bm25_topk_indexed(spark, root, ("qqqnotaword",), k=5)
    assert got.columns == ["doc_id", "bm25"] and got.count() == 0
    # all-OOV batch: same contract
    got_b = bm25_batch_topk_indexed(
        spark, root, {0: ("qqqnotaword",), 1: ("zzznothere",)}, k=5
    )
    assert got_b.columns == ["query_id", "doc_id", "bm25"]
    assert got_b.count() == 0
    # mixed vocab: the OOV term contributes nothing, the known terms
    # rank exactly as an inline scorer over the same corpus would
    mixed = bm25_topk_indexed(spark, root, ("alpha", "qqqnotaword"), k=5)
    want = bm25_topk(corpus, ("alpha", "qqqnotaword"), k=5)
    assert _rows(mixed) == _rows(want) and mixed.count() == 5


def test_bucket_probe_casts_literals_to_state_types(spark, tmp_path):
    """r15 advisor finding (low): xxhash64 is type-sensitive — a Python
    int probe infers LongType and hashes differently against an int-typed
    bucket column, silently missing rows. The state_path form casts the
    probe literals to the COMMITTED schema's types before hashing."""
    from embulk_executor_mapreduce_spark.sinks.writer import (
        merge_bucket_ids,
        read_merge_state,
        write_sink,
    )
    from embulk_executor_mapreduce_spark.spec import SinkSpec

    path = str(tmp_path / "intkeyed")
    rows = spark.createDataFrame(
        [(k, k * 10, 1) for k in range(50)], "k int, val long, rev long"
    )
    write_sink(
        rows,
        SinkSpec(
            type="parquet",
            path=path,
            mode="merge",
            merge_key=("k",),
            merge_order=("rev",),
            merge_buckets=32,
        ),
    )
    probe_keys = list(range(0, 50, 7))
    ids = merge_bucket_ids(spark, probe_keys, state_path=path)
    got = read_merge_state(spark, path, buckets=ids).filter(
        F.col("k").isin(probe_keys)
    )
    assert {r.k for r in got.collect()} == set(probe_keys)
    # the hazard the cast fixes: hashing the same keys as LONGs maps at
    # least one of them to a different bucket id set
    long_ids = merge_bucket_ids(
        spark, [(int(k),) for k in probe_keys], n_buckets=32
    )
    assert ids != long_ids


def _mixed_rarity_corpus(spark):
    """100 equal-length docs: doc 0 holds the single very-rare term, docs
    1..10 each hold the three moderately-rare terms (df=10). With every
    dl at the average, the tf factor is exactly 1.0 and each score is a
    pure IDF sum — the cleanest surface for the rarity-weighting split."""
    rows = [(0, "rare fill0 fill0 fill0")]
    rows += [(i, f"m1 m2 m3 fill{i}") for i in range(1, 11)]
    rows += [(i, f"fill{i} fill{i} fill{i} fill{i}") for i in range(11, 100)]
    return _docs(spark, rows)


def test_lucene_idf_option_fixes_rarity_overweighting(spark, tmp_path):
    """r15 (VERDICT r14 item 5): the documented rational-IDF divergence,
    now exercised — on a mixed-rarity multi-term query the undamped form
    ranks the one-rare-term doc first (its IDF grows linearly in N/df)
    while idf='lucene' orders the multi-match doc first, matching
    standard log-BM25. Verified at rank level (ln is not hash-pinnable):
    rational doc0 = (99.5/1.5) ≈ 66.3 vs doc1 = 3·(90.5/10.5) ≈ 25.9;
    lucene doc0 = ln(67.33) ≈ 4.21 vs doc1 = 3·ln(9.62) ≈ 6.79."""
    import math

    corpus = _mixed_rarity_corpus(spark)
    q = ("rare", "m1", "m2", "m3")
    rational = [r.doc_id for r in bm25_topk(corpus, q, k=3).collect()]
    lucene = [r.doc_id for r in bm25_topk(corpus, q, k=3, idf="lucene").collect()]
    assert rational[0] == 0 and lucene[0] == 1
    # under lucene ALL ten multi-match docs outrank the rare-term doc
    # (it falls to rank 11); the scores are the micro-floored IDF sums
    lucene11 = [r.doc_id for r in bm25_topk(corpus, q, k=11, idf="lucene").collect()]
    assert set(lucene11[:10]) == set(range(1, 11)) and lucene11[10] == 0
    got = {r.doc_id: r.bm25 for r in bm25_topk(corpus, q, k=11, idf="lucene").collect()}
    want0 = math.floor(
        (math.log(99.5 / 1.5 + 1.0) * (2.2 / 2.2) * 1_000_000.0) + 0.5
    ) / 1_000_000.0
    assert abs(got[0] - want0) <= 1e-6


def test_lucene_indexed_equals_inline(spark, tmp_path):
    """indexed ≡ inline holds under EITHER idf (the shared _bm25_contrib
    is parameterized, never copied); batch probes agree per query; an
    unknown idf name is config, not a silent default."""
    import pytest

    from embulk_executor_mapreduce_spark.errors import ConfigError
    from embulk_executor_mapreduce_spark.operators.search import (
        bm25_batch_topk_indexed,
    )

    corpus = _corpus(spark)
    root = str(tmp_path / "ix")
    bm25_index_build(corpus, root, merge_buckets=8)
    got = bm25_topk_indexed(spark, root, TERMS, k=7, idf="lucene")
    want = bm25_topk(corpus, TERMS, k=7, idf="lucene")
    assert _rows(got) == _rows(want) and got.count() == 7
    batch = bm25_batch_topk_indexed(spark, root, {5: TERMS}, k=7, idf="lucene")
    assert sorted((r.doc_id, r.bm25) for r in batch.collect()) == sorted(
        (r.doc_id, r.bm25) for r in got.collect()
    )
    with pytest.raises(ConfigError, match="idf"):
        bm25_topk(corpus, TERMS, idf="classic").collect()


def test_rrf_fuse_batch_per_query_independence(spark):
    """r15 batched fusion: each query fuses independently (same algebra
    as rrf_fuse per query, micro-unit floors exact, ties by id), and the
    per-query slice equals a single-query rrf_fuse over the same
    rankings."""
    from embulk_executor_mapreduce_spark.operators.search import (
        rrf_fuse,
        rrf_fuse_batch,
    )

    lex = spark.createDataFrame(
        [(0, 10, 1), (0, 20, 2), (1, 30, 1), (1, 10, 2)],
        "query_id long, doc_id long, rank int",
    )
    sem = spark.createDataFrame(
        [(0, 20, 1), (0, 40, 2), (1, 10, 1), (1, 50, 2)],
        "query_id long, doc_id long, rank int",
    )
    batch = {
        (r.query_id, r.doc_id): r.rrf
        for r in rrf_fuse_batch([lex, sem], k=4).collect()
    }
    for q in (0, 1):
        single = {
            r.doc_id: r.rrf
            for r in rrf_fuse(
                [
                    lex.filter(F.col("query_id") == q).select("doc_id", "rank"),
                    sem.filter(F.col("query_id") == q).select("doc_id", "rank"),
                ],
                k=4,
            ).collect()
        }
        assert {d: v for (qq, d), v in batch.items() if qq == q} == single
    # dual-ranked doc beats single-ranked within its query
    assert batch[(0, 20)] > batch[(0, 10)] > batch[(0, 40)]
    assert batch[(1, 10)] > batch[(1, 30)] > batch[(1, 50)]
