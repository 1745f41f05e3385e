"""Round-3 operator surface exposed through the declarative spec (VERDICT r3
item 5): the reference's user surface is the YAML pipeline
(embulk_mapred_config.yml), so pagerank weighting, the incremental dedup
corpus loop, and corpus compaction must all be drivable without Python API
calls — plus config-error tests in the reference's ConfigException style
(TestTimestampPartitioning.java:40-108)."""

import pytest

from embulk_executor_mapreduce_spark.errors import ConfigError
from embulk_executor_mapreduce_spark.plans.compiler import (
    run_pipeline,
    run_pipeline_streaming,
)
from embulk_executor_mapreduce_spark.spec import load_spec

TINY = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2)]


def test_spec_pagerank_weighting_pipeline(spark, tmp_path):
    """Crawl-quality weighting as pure YAML: edge list in → pagerank stage →
    join stage attaching each doc's source-node rank → memory sink. Ranks
    must equal the Python-API operator exactly."""
    from embulk_executor_mapreduce_spark.operators.graph import pagerank

    edges = str(tmp_path / "edges")
    docs = str(tmp_path / "docs")
    spark.createDataFrame(TINY, "src long, dst long").write.parquet(edges)
    spark.createDataFrame(
        [(n, f"doc-from-{n}") for n in range(4)], "node long, text string"
    ).write.parquet(docs)

    run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": edges},
                "filters": [
                    {"type": "pagerank", "src": "src", "dst": "dst", "iters": 4},
                    {
                        "type": "join",
                        "source": {"type": "parquet", "path": docs},
                        "on": ["node"],
                    },
                ],
                "out": {"type": "memory", "options": {"view": "weighted_docs"}},
            }
        ),
    )
    got = {
        r.node: (r.rank, r.text)
        for r in spark.table("weighted_docs").collect()
    }
    want = {
        r.node: r.rank
        for r in pagerank(
            spark.createDataFrame(TINY, "src long, dst long"), iters=4
        ).collect()
    }
    assert {n: rk for n, (rk, _) in got.items()} == want
    assert got[2][1] == "doc-from-2"

    # the flagged dangling-redistribution variant rides the same stage
    run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": edges},
                "filters": [
                    {
                        "type": "pagerank",
                        "src": "src",
                        "dst": "dst",
                        "iters": 3,
                        "redistribute_dangling": True,
                    }
                ],
                "out": {"type": "memory", "options": {"view": "pr_dangling"}},
            }
        ),
    )
    want_d = {
        r.node: r.rank
        for r in pagerank(
            spark.createDataFrame(TINY, "src long, dst long"),
            iters=3,
            redistribute_dangling=True,
        ).collect()
    }
    assert {
        r.node: r.rank for r in spark.table("pr_dangling").collect()
    } == want_d


def test_spec_dedup_corpus_pipeline_with_compaction(spark, tmp_path):
    """The continuous-crawl loop as pure YAML: two batch loads through the
    dedup_corpus sink (distinct batch_tags), cross-batch dups dropped, then
    a third load with options.compact folds the committed batch dirs into a
    generation — all spec-driven."""
    from embulk_executor_mapreduce_spark.sinks.compact import read_corpus

    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")

    def load_batch(rows, tag, compact=None):
        src = str(tmp_path / f"src{tag}")
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(src)
        out = {
            "type": "dedup_corpus",
            "path": corpus,
            "options": {"state": state, "batch_tag": tag, "merge_buckets": 8},
        }
        if compact is not None:
            out["options"]["compact"] = compact
        run_pipeline(
            spark,
            load_spec({"in": {"type": "parquet", "path": src}, "out": out}),
        )

    load_batch([(10, "aaa"), (11, "aaa"), (12, "bbb")], 0)
    load_batch([(20, "bbb"), (21, "ccc")], 1)
    ids = sorted(r.doc_id for r in read_corpus(spark, corpus).collect())
    assert ids == [10, 12, 21]  # in-batch dup 11 and cross-batch dup 20 dropped

    # third load triggers spec-driven compaction of everything but itself
    load_batch([(30, "ddd")], 2, compact={"max_generations": 4})
    import os

    names = sorted(os.listdir(corpus))
    assert any(n.startswith("compacted=") for n in names)
    assert sorted(r.doc_id for r in read_corpus(spark, corpus).collect()) == [
        10,
        12,
        21,
        30,
    ]


def test_spec_pagerank_config_errors(spark, tmp_path):
    """ConfigException-style matrix for the pagerank stage."""
    edges = str(tmp_path / "edges")
    spark.createDataFrame(TINY, "src long, dst long").write.parquet(edges)

    def run(flt):
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": edges},
                    "filters": [flt],
                    "out": {"type": "null"},
                }
            ),
        )

    with pytest.raises(Exception, match="requires 'src' and 'dst'"):
        run({"type": "pagerank", "src": "src"})
    with pytest.raises(Exception, match="missing from the data"):
        run({"type": "pagerank", "src": "src", "dst": "nope"})
    with pytest.raises(Exception, match="iters must be >= 1"):
        run({"type": "pagerank", "src": "src", "dst": "dst", "iters": 0})
    # iterative eager stage is batch-only
    with pytest.raises(ConfigError, match="not streamable"):
        run_pipeline_streaming(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": edges},
                    "filters": [{"type": "pagerank", "src": "src", "dst": "dst"}],
                    "out": {"type": "parquet", "path": str(tmp_path / "o")},
                }
            ),
        )


def test_spec_dedup_corpus_config_errors(tmp_path):
    base = {
        "in": {"type": "parquet", "path": str(tmp_path / "src")},
        "out": {
            "type": "dedup_corpus",
            "path": str(tmp_path / "corpus"),
            "options": {"state": str(tmp_path / "state")},
        },
    }
    with pytest.raises(ConfigError, match="options.compact"):
        doc = {
            **base,
            "out": {
                **base["out"],
                "options": {**base["out"]["options"], "compact": "yes please"},
            },
        }
        load_spec(doc)
    with pytest.raises(ConfigError, match="requires options.state"):
        load_spec(
            {
                **base,
                "out": {"type": "dedup_corpus", "path": str(tmp_path / "corpus")},
            }
        )


def test_spec_semantic_dedup_corpus_pipeline(spark, tmp_path):
    """The SEMANTIC crawl loop as pure YAML (r5): two embedding batch loads
    through the dedup_corpus sink with options.semantic — batch 1 trains
    and persists the centroid table, batch 2 assigns against it and drops
    the near-dup of a committed survivor."""
    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    cents = str(tmp_path / "centroids")

    def vec(seed, wiggle=0.0):
        return [((seed * 31 + j * 7) % 13 - 6) / 6.0 + wiggle * (j % 2) for j in range(8)]

    def load_batch(rows, tag):
        src = str(tmp_path / f"src{tag}")
        spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(
            1
        ).write.mode("overwrite").parquet(src)
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": src},
                    "out": {
                        "type": "dedup_corpus",
                        "path": corpus,
                        "options": {
                            "state": state,
                            "centroids": cents,
                            "semantic": True,
                            "batch_tag": tag,
                            "merge_buckets": 8,
                            "k": 2,
                            "threshold_micro": 999_000,
                        },
                    },
                }
            ),
        )

    load_batch([(10, vec(1)), (11, vec(1, 1e-4)), (12, vec(50))], 0)
    load_batch([(20, vec(1, 2e-4)), (21, vec(7))], 1)
    ids = sorted(r.vec_id for r in spark.read.parquet(corpus).collect())
    assert ids == [10, 12, 21]  # in-batch dup 11, cross-batch dup 20 dropped
    assert spark.read.parquet(cents).count() == 2  # trained once, persisted

    # corpus maintenance composes: a third load with options.compact folds
    # the committed semantic-corpus batch dirs into a generation, content
    # and provenance intact (the same machinery the lexical loop uses)
    import os

    from embulk_executor_mapreduce_spark.sinks.compact import read_corpus

    def load_batch_compact(rows, tag):
        src = str(tmp_path / f"src{tag}")
        spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(
            1
        ).write.mode("overwrite").parquet(src)
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": src},
                    "out": {
                        "type": "dedup_corpus",
                        "path": corpus,
                        "options": {
                            "state": state,
                            "centroids": cents,
                            "semantic": True,
                            "batch_tag": tag,
                            "merge_buckets": 8,
                            "k": 2,
                            "threshold_micro": 999_000,
                            "compact": {"max_generations": 4},
                        },
                    },
                }
            ),
        )

    load_batch_compact([(30, vec(23))], 2)
    names = sorted(os.listdir(corpus))
    assert any(n.startswith("compacted=") for n in names), names
    got = sorted(
        (r.vec_id, r.ingest_batch) for r in read_corpus(spark, corpus).collect()
    )
    assert got == [(10, 0), (12, 0), (21, 1), (30, 2)]


def test_spec_semantic_dedup_corpus_config_errors(tmp_path):
    base_out = {
        "type": "dedup_corpus",
        "path": str(tmp_path / "corpus"),
        "options": {"state": str(tmp_path / "state"), "semantic": True},
    }
    doc = {"in": {"type": "parquet", "path": str(tmp_path / "src")}, "out": base_out}
    with pytest.raises(ConfigError, match="requires\\s+options.centroids"):
        load_spec(doc)
    with pytest.raises(ConfigError, match="mutually exclusive"):
        load_spec(
            {
                **doc,
                "out": {
                    **base_out,
                    "options": {
                        **base_out["options"],
                        "centroids": str(tmp_path / "c"),
                        "near": True,
                    },
                },
            }
        )


def test_streaming_config_errors_name_the_batch_alternative(spark, tmp_path):
    """VERDICT r5 item 8: a correct not-streamable rejection should tell the
    user WHERE the capability lives — every stream ConfigError for a
    batch-supported feature names run_pipeline / the batch path."""
    from embulk_executor_mapreduce_spark.plans.compiler import (
        run_pipeline_streaming,
    )

    csv = tmp_path / "src.csv"
    csv.write_text("junk\njunk\nid,name\n1,a\n")
    doc = {
        "in": {
            "type": "csv",
            "path": str(csv),
            "skip_header_lines": 3,
            "columns": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": "string"},
            ],
        },
        "out": {"type": "parquet", "path": str(tmp_path / "out")},
    }
    with pytest.raises(ConfigError, match=r"batch path \(run_pipeline\)"):
        run_pipeline_streaming(spark, load_spec(doc))

    txt = tmp_path / "doc.txt"
    txt.write_text("whole file\n")
    with pytest.raises(ConfigError, match="run_pipeline"):
        run_pipeline_streaming(
            spark,
            load_spec(
                {
                    "in": {
                        "type": "text",
                        "path": str(txt),
                        "options": {"wholetext": True},
                    },
                    "out": {"type": "parquet", "path": str(tmp_path / "o2")},
                }
            ),
        )

    with pytest.raises(ConfigError, match="batch-only.*run_pipeline"):
        run_pipeline_streaming(
            spark,
            load_spec(
                {
                    "in": {"type": "text", "path": str(txt)},
                    "out": {"type": "null"},
                }
            ),
        )


def test_spec_semantic_two_level_corpus_pipeline(spark, tmp_path):
    """The TWO-LEVEL semantic crawl loop as pure YAML (r6): two embedding
    batch loads through the dedup_corpus sink with
    options.semantic_two_level — batch 1 trains and persists BOTH centroid
    levels, batch 2 assigns against the stored pair and drops the near-dup
    of a committed survivor. Config errors: mode exclusivity and the
    centroids requirement name the two-level option."""
    corpus = str(tmp_path / "corpus")
    state = str(tmp_path / "state")
    cents = str(tmp_path / "centroids")

    def vec(seed, wiggle=0.0):
        return [((seed * 31 + j * 7) % 13 - 6) / 6.0 + wiggle * (j % 2) for j in range(8)]

    def load_batch(rows, tag):
        src = str(tmp_path / f"src{tag}")
        spark.createDataFrame(rows, "vec_id long, embedding array<double>").coalesce(
            1
        ).write.mode("overwrite").parquet(src)
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": src},
                    "out": {
                        "type": "dedup_corpus",
                        "path": corpus,
                        "options": {
                            "state": state,
                            "centroids": cents,
                            "semantic_two_level": True,
                            "batch_tag": tag,
                            "merge_buckets": 8,
                            "coarse_k": 2,
                            "sub_k": 1,  # leaf == cell at toy scale
                            "threshold_micro": 999_000,
                        },
                    },
                }
            ),
        )

    load_batch([(10, vec(1)), (11, vec(1, 1e-4)), (12, vec(50))], 0)
    load_batch([(20, vec(1, 2e-4)), (21, vec(7))], 1)
    ids = sorted(r.vec_id for r in spark.read.parquet(corpus).collect())
    assert ids == [10, 12, 21]
    assert spark.read.parquet(f"{cents}/coarse").count() == 2
    assert spark.read.parquet(f"{cents}/sub").count() > 0

    # config matrix
    base = {
        "in": {"type": "parquet", "path": str(tmp_path / "src0")},
        "out": {
            "type": "dedup_corpus",
            "path": corpus,
            "options": {"state": state, "semantic_two_level": True},
        },
    }
    with pytest.raises(ConfigError, match="semantic_two_level requires\\s+options.centroids"):
        load_spec(base)
    with pytest.raises(ConfigError, match="mutually exclusive"):
        load_spec(
            {
                **base,
                "out": {
                    **base["out"],
                    "options": {
                        "state": state,
                        "centroids": cents,
                        "semantic": True,
                        "semantic_two_level": True,
                    },
                },
            }
        )


def test_spec_url_canonicalize_pipeline(spark, tmp_path):
    """Web-corpus front door as pure YAML (VERDICT r7 item 3 — the r7
    build-then-revert): messy surface URLs in → url_canonicalize stage →
    dedup stage keyed on canon_url (deterministic survivor) → memory sink.
    Canonical values must equal the Python-API operator exactly, and the
    same spec must stream (the stage is pure column expressions)."""
    from embulk_executor_mapreduce_spark.operators.web import url_canonicalize

    rows = [
        (1, "HTTP://Example.com:80/a//b/?utm_source=x&id=1#frag"),
        (2, "http://example.com/a/b?id=1"),
        (3, "https://User:pw@Sample.CO.UK:443/p/?z=2&a=1&gclid=9"),
        (4, "https://sample.co.uk/p?a=1&z=2"),
        (5, "http://other.org/q#a?notquery=1"),
    ]
    src = str(tmp_path / "urls")
    spark.createDataFrame(rows, "doc_id long, url string").write.parquet(src)

    spec = load_spec(
        {
            "in": {"type": "parquet", "path": src},
            "filters": [
                {"type": "url_canonicalize", "column": "url"},
                {
                    "type": "dedup",
                    "columns": ["canon_url"],
                    "order_by": ["doc_id"],
                },
            ],
            "out": {"type": "memory", "options": {"view": "canon_docs"}},
        }
    )
    run_pipeline(spark, spec)
    got = {
        r.doc_id: (r.canon_url, r.host, r.registrable_domain)
        for r in spark.table("canon_docs").collect()
    }
    # doc 2 collapses into doc 1, doc 4 into doc 3; 5 survives alone
    assert sorted(got) == [1, 3, 5]
    want = {
        r.doc_id: (r.canon_url, r.host, r.registrable_domain)
        for r in url_canonicalize(
            spark.createDataFrame(rows, "doc_id long, url string")
        ).collect()
    }
    assert got == {k: want[k] for k in got}
    assert got[1][0] == "http://example.com/a/b?id=1"
    assert got[3] == (
        "https://sample.co.uk/p?a=1&z=2",
        "sample.co.uk",
        "sample.co.uk",
    )
    assert got[5][0] == "http://other.org/q"

    # the identical stage streams (pure column expressions, map-only)
    out_stream = str(tmp_path / "stream_out")
    report = run_pipeline_streaming(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": src},
                "filters": [{"type": "url_canonicalize"}],
                "out": {"type": "parquet", "path": out_stream},
            }
        ),
    )
    assert report.succeeded and report.output_rows == 5
    streamed = {
        r.doc_id: (r.canon_url, r.host, r.registrable_domain)
        for r in spark.read.parquet(out_stream).collect()
    }
    assert streamed == want

    # config-time error: missing column, reference findColumnByName style
    # (run_pipeline wraps the ConfigError in its task-failure classification)
    with pytest.raises(Exception, match="missing from the data"):
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": src},
                    "filters": [
                        {"type": "url_canonicalize", "column": "nope"}
                    ],
                    "out": {"type": "memory", "options": {"view": "x"}},
                }
            ),
        )


def test_spec_table_source_bucketed_pagerank_production_form(spark, tmp_path):
    """SCALING.md §3 decision rule at the spec surface (VERDICT r7 item 6):
    a standing graph written once via the TABLE SINK (bucketBy src), then
    ranked via ``in: {type: table}`` + the pagerank stage's
    ``edges_distinct: true`` production selector. Ranks must equal the
    ad-hoc (non-bucketed) form bit for bit, the table-source scan must
    actually ride the bucket layout, and config errors stay reference-style."""
    import uuid

    from embulk_executor_mapreduce_spark.operators.graph import pagerank
    from embulk_executor_mapreduce_spark.plans.compiler import compile_pipeline

    edges = str(tmp_path / "edges")
    spark.createDataFrame(TINY, "src long, dst long").write.parquet(edges)
    table = f"spec_edges_{uuid.uuid4().hex[:12]}"
    try:
        # one-time layout write: parquet edge dump → dedup → bucketed table
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": edges},
                    "filters": [{"type": "dedup", "columns": ["src", "dst"]}],
                    "out": {
                        "type": "table",
                        "table": table,
                        "bucket_by": ["src"],
                        "buckets": 4,
                        "sort_by": ["src"],
                    },
                }
            ),
        )
        # the table source rides the bucket layout (no path plumbing): a
        # bucket-key aggregate plans bucketed with ZERO shuffle exchanges
        from embulk_executor_mapreduce_spark.plans.inspect import num_exchanges

        probe = compile_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "table", "table": table},
                    "filters": [
                        {
                            "type": "aggregate",
                            "group_by": ["src"],
                            "aggs": {"outdeg": "count(*)"},
                        }
                    ],
                    "out": {"type": "null"},
                }
            ),
        )
        assert "Bucketed: true" in probe._jdf.queryExecution().toString()
        assert num_exchanges(probe) == 0
        # production-form ranking, pure YAML
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "table", "table": table},
                    "filters": [
                        {
                            "type": "pagerank",
                            "src": "src",
                            "dst": "dst",
                            "iters": 4,
                            "edges_distinct": True,
                        }
                    ],
                    "out": {"type": "memory", "options": {"view": "pr_prod"}},
                }
            ),
        )
        got = {r.node: r.rank for r in spark.table("pr_prod").collect()}
        want = {
            r.node: r.rank
            for r in pagerank(
                spark.createDataFrame(TINY, "src long, dst long"), iters=4
            ).collect()
        }
        assert got == want
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")

    # config-time errors: nameless table source; unknown table type combos
    with pytest.raises(ConfigError, match="table source requires"):
        load_spec(
            {"in": {"type": "table"}, "out": {"type": "null"}}
        ).validate()
    # streaming rejection names the batch alternative (repo convention)
    with pytest.raises(ConfigError, match=r"batch path \(run_pipeline\)"):
        run_pipeline_streaming(
            spark,
            load_spec(
                {
                    "in": {"type": "table", "table": "whatever"},
                    "out": {"type": "parquet", "path": str(tmp_path / "s")},
                }
            ),
        )


SF001 = "/root/testdata/sf0.001"


def test_spec_text_append_stages_map_only_and_parity(spark):
    """The r8 training-data text stages (filters.py docstring): every
    append-semantics stage rides the struct-pack — ONE map-only projection,
    ZERO exchanges for the whole five-stage chain — and each appended value
    equals the operators/text.py function it reuses, joined back by doc_id."""
    from embulk_executor_mapreduce_spark.operators import text as text_ops
    from embulk_executor_mapreduce_spark.plans.compiler import compile_pipeline
    from embulk_executor_mapreduce_spark.plans.inspect import num_exchanges

    out = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": f"{SF001}/documents.parquet"},
                "filters": [
                    {"type": "text_stats"},
                    {"type": "quality_score"},
                    {"type": "language_id"},
                    {"type": "token_count"},
                    {"type": "fingerprint"},
                ],
                "out": {"type": "null"},
            }
        ),
    )
    assert num_exchanges(out) == 0  # five append stages, still map-only
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    assert set(got) == {r.doc_id for r in docs.select("doc_id").collect()}
    checks = {
        "text_stats": ["n_tokens", "n_chars_computed", "avg_token_len"],
        "quality_score": ["quality"],
        "language_id": ["lang_guess", "marker_hits"],
        "token_counts": ["n_words", "n_bpeish_tokens", "n_unique_tokens"],
        "fingerprint": ["fingerprint"],
    }
    for op_name, cols in checks.items():
        want = {
            r["doc_id"]: r.asDict()
            for r in getattr(text_ops, op_name)(docs).collect()
        }
        for doc_id, row in got.items():
            for c in cols:
                assert row[c] == want[doc_id][c], (op_name, c, doc_id)


def test_spec_pii_scrub_stage_replaces_text_in_place(spark, tmp_path):
    """pii_scrub stage: the text column is REPLACED by its redacted form with
    audit counts appended; all other columns and their order survive."""
    from embulk_executor_mapreduce_spark.operators.text import pii_scrub

    src = str(tmp_path / "docs")
    rows = [
        (0, "mail me at a.b@example.com now", "crawl"),
        (1, "call 5551234567 or 911", "books"),
        (2, "clean text only", "web"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(src)
    run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": src},
                "filters": [{"type": "pii_scrub"}],
                "out": {"type": "memory", "options": {"view": "scrubbed_docs"}},
            }
        ),
    )
    out = spark.table("scrubbed_docs")
    assert out.columns == ["doc_id", "text", "source", "n_email", "n_digits"]
    got = {r.doc_id: r for r in out.collect()}
    want = {
        r["doc_id"]: r
        for r in pii_scrub(
            spark.createDataFrame(rows, "doc_id long, text string, source string"),
            "text",
            "doc_id",
        ).collect()
    }
    for i in got:
        assert got[i].text == want[i]["scrubbed"]
        assert (got[i].n_email, got[i].n_digits) == (
            want[i]["n_email"],
            want[i]["n_digits"],
        )
    assert "<EMAIL>" in got[0].text and "<DIGITS>" in got[1].text

    # custom pattern set: audit columns derive from the OPERATOR's output
    # (r8 review — no literal copy of text.pii_scrub's defaults here), so
    # n_<name> follows whatever patterns the spec declares
    run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": src},
                "filters": [
                    {
                        "type": "pii_scrub",
                        "patterns": {"phone": r"[0-9]{7,}"},
                    }
                ],
                "out": {"type": "memory", "options": {"view": "scrub_custom"}},
            }
        ),
    )
    cust = spark.table("scrub_custom")
    assert cust.columns == ["doc_id", "text", "source", "n_phone"]
    crow = {r.doc_id: r for r in cust.collect()}
    assert crow[1].n_phone == 1 and "<PHONE>" in crow[1].text
    assert crow[0].n_phone == 0  # the email stays — not in the custom set
    assert "@example.com" in crow[0].text


def test_spec_fingerprint_dedup_chain_and_minhash_dedup(spark, tmp_path):
    """The declarative corpus front door: fingerprint + dedup removes exact
    content dups (order-insensitive), minhash_dedup removes near-dup LOSERS
    (cluster min-id survives) — both as pure YAML, parity against the
    operator-level pipeline."""
    from embulk_executor_mapreduce_spark.operators.dedup import (
        connected_components,
        minhash_candidates,
    )

    src = str(tmp_path / "docs")
    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [
        (0, base.strip()),
        (1, base.strip()),  # exact dup of 0
        (2, (base + "with one extra suffix token").strip()),  # near-dup of 0
        (3, "completely different content about spark shuffles and joins"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": src},
                "filters": [
                    {"type": "fingerprint"},
                    {"type": "dedup", "columns": ["fingerprint"], "order_by": ["doc_id"]},
                    {"type": "drop", "columns": ["fingerprint"]},
                    {"type": "minhash_dedup", "id": "doc_id"},
                ],
                "out": {"type": "memory", "options": {"view": "front_door"}},
            }
        ),
    )
    kept = sorted(r.doc_id for r in spark.table("front_door").collect())

    # operator-level expectation: exact dedup keeps min doc_id per content,
    # then near-dup CC keeps each cluster's min id
    docs = spark.createDataFrame([rows[0], rows[2], rows[3]], "doc_id long, text string")
    pairs = minhash_candidates(docs, "text", "doc_id")
    losers = {
        r.doc_id
        for r in connected_components(pairs)
        .filter("cluster_id != doc_id")
        .collect()
    }
    want = sorted({0, 2, 3} - losers)
    assert kept == want
    assert 2 not in kept  # the near-dup actually dropped
    assert kept[0] == 0 and 3 in kept


def test_spec_repetition_stats_stage(spark, tmp_path):
    """repetition_stats appends the Gopher fracs + rep_keep via id join-back;
    values equal the operator, all original columns survive."""
    from embulk_executor_mapreduce_spark.operators.text import repetition_quality

    src = str(tmp_path / "docs")
    rows = [
        (0, "spam spam spam spam spam spam spam spam spam ham"),
        (1, "a genuinely varied sentence with mostly unique words here"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": src},
                "filters": [{"type": "repetition_stats", "id": "doc_id"}],
                "out": {"type": "memory", "options": {"view": "rep_docs"}},
            }
        ),
    )
    out = spark.table("rep_docs")
    assert set(out.columns) == {
        "doc_id", "text", "top_token_frac", "unique_token_frac", "rep_keep",
    }
    got = {r.doc_id: r for r in out.collect()}
    want = {
        r["doc_id"]: r
        for r in repetition_quality(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    for i in got:
        assert got[i].rep_keep == want[i]["keep"]
        assert got[i].top_token_frac == want[i]["top_token_frac"]
        assert got[i].unique_token_frac == want[i]["unique_token_frac"]
    assert got[0].rep_keep is False and got[1].rep_keep is True


def test_spec_text_stage_config_errors(spark, tmp_path):
    """Reference ConfigException style: missing column, missing id, appended
    name collision, reserved struct-pack name, streaming rejection naming
    the batch alternative."""
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, "hello world", 5)], "doc_id long, text string, n_tokens int"
    ).write.parquet(src)

    def run_with(filters, path=src):
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": path},
                    "filters": filters,
                    "out": {"type": "null"},
                }
            ),
        )

    with pytest.raises(ConfigError, match="missing from the data"):
        run_with([{"type": "quality_score", "column": "body"}])
    with pytest.raises(ConfigError, match="requires an 'id'"):
        run_with([{"type": "minhash_dedup"}])
    with pytest.raises(ConfigError, match="id column 'nope'"):
        run_with([{"type": "repetition_stats", "id": "nope"}])
    # doc already has n_tokens → text_stats must refuse, not overwrite
    with pytest.raises(ConfigError, match="already"):
        run_with([{"type": "text_stats"}])
    # appending the same stage twice collides on its own output
    with pytest.raises(ConfigError, match="already"):
        run_with([{"type": "drop", "columns": ["n_tokens"]},
                  {"type": "fingerprint"}, {"type": "fingerprint"}])
    # reserved struct-pack name
    rsrc = str(tmp_path / "rdocs")
    spark.createDataFrame([(0, "x")], "`__row` long, text string").write.parquet(rsrc)
    with pytest.raises(ConfigError, match="reserved"):
        run_with([{"type": "quality_score"}], path=rsrc)
    # streaming: batch-only stages rejected up front with the alternative named
    with pytest.raises(ConfigError, match=r"batch path \(run_pipeline\)"):
        run_pipeline_streaming(
            spark,
            load_spec(
                {
                    "in": {
                        "type": "csv",
                        "path": src,
                        "columns": [{"name": "text", "type": "string"}],
                    },
                    "filters": [{"type": "minhash_dedup", "id": "text"}],
                    "out": {"type": "parquet", "path": str(tmp_path / "s")},
                }
            ),
        )


def test_minhash_dedup_stage_compile_stays_lazy_and_fails_fast(
    spark, tmp_path, monkeypatch
):
    """r16 review finding: the minhash_dedup stage's one-evaluation
    checkpoint must be LAZY (eager=False) so the stage adds NO eager step
    of its own — the connected-components loop inside the stage is
    eagerly iterative by design (pre-existing, documented in the bench's
    TIME_INCLUDES_BUILD entry), but the input materialization must ride
    its first iteration rather than run as a separate compile-time job,
    and a config error in a stage AFTER minhash_dedup must still raise
    ConfigError at compile time. Pins (a) the stage-input checkpoint is
    the FIRST checkpoint call and lazy, (b) the post-stage ConfigError."""
    from embulk_executor_mapreduce_spark.plans.compiler import compile_pipeline

    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(i, f"some text {i} " * 3) for i in range(6)],
        "doc_id long, text string",
    ).write.parquet(src)

    DF = type(spark.range(1))
    eager_flags: list[bool] = []
    orig_ck = DF.localCheckpoint

    def spy(self, eager=True, *a, **kw):
        # pass-through signature (r17, ADVICE r16): PySpark 4.1 also
        # takes storageLevel
        eager_flags.append(eager)
        return orig_ck(self, eager, *a, **kw)

    monkeypatch.setattr(DF, "localCheckpoint", spy)
    # dedup without 'columns' is a stage-apply ConfigError: it must fire
    # even though the preceding minhash_dedup stage checkpoints its input
    with pytest.raises(ConfigError, match="dedup filter requires"):
        compile_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": src},
                    "filters": [
                        {"type": "minhash_dedup", "id": "doc_id"},
                        {"type": "dedup"},
                    ],
                    "out": {"type": "null"},
                }
            ),
        )
    # the stage-input checkpoint is LAZY and precedes the CC loop's eager
    # per-iteration materializations (pre-existing design). Asserted as
    # "some lazy flag before the first eager one" rather than pinning
    # index 0 (r17, ADVICE r16: an earlier legitimately-eager source
    # checkpoint must not break this test without a real regression).
    assert eager_flags, eager_flags
    first_eager = next(
        (i for i, e in enumerate(eager_flags) if e), len(eager_flags)
    )
    assert any(not e for e in eager_flags[:first_eager]), eager_flags


def test_spec_text_append_stages_stream(spark, tmp_path):
    """The struct-pack append stages are pure projections, so the IDENTICAL
    chain streams (unified batch/streaming story): quality_score + filter
    prune + pii_scrub over a file stream equals the batch run row for row."""
    src = str(tmp_path / "docs")
    rows = [
        (0, "the and for are with his they this have from one had word"),
        (1, "x"),  # fails the length band -> pruned
        (2, "the quick brown fox mail me at who@example.org with this and that"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    spec = {
        "in": {"type": "parquet", "path": src},
        "filters": [
            {"type": "quality_score"},
            {"type": "filter", "predicate": "quality >= 0.7"},
            {"type": "pii_scrub"},
        ],
        "out": {"type": "parquet", "path": str(tmp_path / "batch_out")},
    }
    run_pipeline(spark, load_spec(spec))
    batch = {
        r.doc_id: (r.text, r.quality, r.n_email)
        for r in spark.read.parquet(str(tmp_path / "batch_out")).collect()
    }
    stream_out = str(tmp_path / "stream_out")
    report = run_pipeline_streaming(
        spark, load_spec({**spec, "out": {"type": "parquet", "path": stream_out}})
    )
    assert report.succeeded
    streamed = {
        r.doc_id: (r.text, r.quality, r.n_email)
        for r in spark.read.parquet(stream_out).collect()
    }
    assert streamed == batch
    assert sorted(streamed) == [0, 2]  # doc 1 pruned by the quality gate
    assert "<EMAIL>" in streamed[2][0]


def test_spec_sample_k_per_group_stage(spark, tmp_path):
    """Per-group cap as YAML: hash_on gives the deterministic hash-ordered
    sample (parity with the sample_k_per_group catalog query's window),
    order_by gives top-k; k and membership invariants hold."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    src = str(tmp_path / "rows")
    data = [(i, f"g{i % 3}", float(i * 7 % 11)) for i in range(60)]
    spark.createDataFrame(data, "id long, grp string, score double").write.parquet(src)

    def run_stage(cfg, view):
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": src},
                    "filters": [{"type": "sample_k_per_group", **cfg}],
                    "out": {"type": "memory", "options": {"view": view}},
                }
            ),
        )
        return spark.table(view).collect()

    # hash-ordered deterministic sample: equals the hand-built window
    got = sorted(r.id for r in run_stage({"group_by": ["grp"], "k": 4, "hash_on": "id"}, "s1"))
    w = W.partitionBy("grp").orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
    want = sorted(
        r.id
        for r in spark.read.parquet(src)
        .withColumn("rn", F.row_number().over(w))
        .filter("rn <= 4")
        .collect()
    )
    assert got == want and len(got) == 12
    # rerun is identical (deterministic)
    assert got == sorted(r.id for r in run_stage({"group_by": ["grp"], "k": 4, "hash_on": "id"}, "s2"))

    # order_by top-k: the 2 highest scores per group survive
    top = run_stage({"group_by": ["grp"], "k": 2, "order_by": ["score desc", "id"]}, "s3")
    by_grp = {}
    for r in top:
        by_grp.setdefault(r.grp, []).append(r.score)
    full = spark.read.parquet(src).collect()
    for g, scores in by_grp.items():
        best = sorted((r.score for r in full if r.grp == g), reverse=True)[:2]
        assert sorted(scores, reverse=True) == best

    # config errors, reference ConfigException style
    with pytest.raises(ConfigError, match="requires 'group_by'"):
        run_stage({"k": 3, "hash_on": "id"}, "e1")
    with pytest.raises(ConfigError, match="'order_by' .*or 'hash_on'"):
        run_stage({"group_by": ["grp"]}, "e2")
    with pytest.raises(ConfigError, match="k must be >= 1"):
        run_stage({"group_by": ["grp"], "k": 0, "hash_on": "id"}, "e3")
    with pytest.raises(ConfigError, match="missing from the data"):
        run_stage({"group_by": ["nope"], "k": 3, "hash_on": "id"}, "e4")

    # __rn is the stage's scratch rank column: a pre-existing __rn is a
    # ConfigError (r8 review), not a silent overwrite-then-drop of the
    # user's column — same contract as the append stages' collision guard
    src_rn = str(tmp_path / "rows_rn")
    spark.createDataFrame(
        [(1, "g", 7)], "id long, grp string, __rn long"
    ).write.parquet(src_rn)
    with pytest.raises(ConfigError, match="__rn"):
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": src_rn},
                    "filters": [
                        {
                            "type": "sample_k_per_group",
                            "group_by": ["grp"],
                            "k": 1,
                            "hash_on": "id",
                        }
                    ],
                    "out": {"type": "memory", "options": {"view": "ern"}},
                }
            ),
        )


def test_spec_sample_and_sort_stages_accept_dotted_columns(spark, tmp_path):
    """ADVICE r8: sample_k_per_group's group_by/hash_on and the
    dedup/sort stages' column specs must treat a dotted TOP-LEVEL name
    ("a.b") as the column itself (backticked via _bt, like the r8
    text-append stages), not a struct-field path."""
    src = str(tmp_path / "dotted")
    data = [(i, f"g{i % 2}", i % 5) for i in range(20)]
    spark.createDataFrame(data, "`my.id` long, `my.grp` string, v long").write.parquet(src)

    def run_stage(filt, view):
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": src},
                    "filters": [filt],
                    "out": {"type": "memory", "options": {"view": view}},
                }
            ),
        )
        return spark.table(view).collect()

    got = run_stage(
        {"type": "sample_k_per_group", "group_by": ["my.grp"], "k": 3, "hash_on": "my.id"},
        "dot1",
    )
    assert len(got) == 6
    from collections import Counter

    assert Counter(r["my.grp"] for r in got) == {"g0": 3, "g1": 3}
    # order_by with a dotted sort spec (exercises _sort_col's _bt)
    top = run_stage(
        {"type": "sample_k_per_group", "group_by": ["my.grp"], "k": 1, "order_by": ["my.id desc"]},
        "dot2",
    )
    assert sorted(r["my.id"] for r in top) == [18, 19]
    # dedup stage with dotted partition + order columns
    dd = run_stage(
        {"type": "dedup", "columns": ["my.grp"], "order_by": ["my.id"]},
        "dot3",
    )
    assert sorted(r["my.id"] for r in dd) == [0, 1]


def test_spec_chunk_and_decontaminate_stages(spark, tmp_path):
    """Training-example materialization + benchmark hygiene as YAML:
    chunk fans documents into overlapping token windows (all input columns
    kept, parity vs chunk_token_windows, streams); decontaminate drops
    benchmark-leaking docs under both methods (exact n-gram and minhash)."""
    from embulk_executor_mapreduce_spark.operators.text import chunk_token_windows

    src = str(tmp_path / "docs")
    long_text = " ".join(f"tok{i}" for i in range(20))
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, long_text, "web"),
        (1, bench_text + " plus a tail", "crawl"),
        (2, "short odd words nothing shared anywhere really", "books"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(src)

    # chunk: window 8 stride 4 over doc 0 (20 tokens) -> starts 0,4,8,12 -> 4 chunks
    run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": src},
                "filters": [
                    {"type": "filter", "predicate": "doc_id = 0"},
                    {"type": "chunk", "window": 8, "stride": 4},
                ],
                "out": {"type": "memory", "options": {"view": "chunks"}},
            }
        ),
    )
    got = sorted(
        (r.chunk_idx, r.chunk_text, r.chunk_tokens, r.source)
        for r in spark.table("chunks").collect()
    )
    assert len(got) == 4 and all(s == "web" for (_, _, _, s) in got)
    want = sorted(
        (r.chunk_idx, r.chunk_text, r.chunk_tokens)
        for r in chunk_token_windows(
            spark.createDataFrame([rows[0]], "doc_id long, text string, source string"),
            window=8,
            stride=4,
        ).collect()
    )
    assert [(i, t, n) for (i, t, n, _) in got] == want

    # decontaminate: benchmark shares 5-grams with doc 1 only
    bench = str(tmp_path / "bench")
    spark.createDataFrame([(bench_text,)], "text string").write.parquet(bench)
    # doc 1 = benchmark + 3-word tail: J ~ 0.67, measured signature
    # agreement 15/16 (deterministic hash family) — min_matches 8 separates
    # the leak cleanly; unrelated docs share no shingles (agreement 0)
    for method, knobs in (("ngram", {"n": 5}), ("minhash", {"min_matches": 8})):
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": src},
                    "filters": [
                        {
                            "type": "decontaminate",
                            "benchmark": {"type": "parquet", "path": bench},
                            "id": "doc_id",
                            "method": method,
                            **knobs,
                        }
                    ],
                    "out": {"type": "memory", "options": {"view": f"clean_{method}"}},
                }
            ),
        )
        kept = sorted(r.doc_id for r in spark.table(f"clean_{method}").collect())
        assert kept == [0, 2], method  # doc 1 leaked the benchmark

    # config errors + streaming behavior
    with pytest.raises(ConfigError, match="requires a 'benchmark'"):
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": src},
                    "filters": [{"type": "decontaminate", "id": "doc_id"}],
                    "out": {"type": "null"},
                }
            ),
        )
    with pytest.raises(ConfigError, match="method 'zip' unknown"):
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": src},
                    "filters": [
                        {
                            "type": "decontaminate",
                            "benchmark": {"type": "parquet", "path": bench},
                            "id": "doc_id",
                            "method": "zip",
                        }
                    ],
                    "out": {"type": "null"},
                }
            ),
        )
    # chunk streams; decontaminate does not (named batch alternative)
    stream_out = str(tmp_path / "chunk_stream")
    report = run_pipeline_streaming(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": src},
                "filters": [{"type": "chunk", "window": 8, "stride": 4}],
                "out": {"type": "parquet", "path": stream_out},
            }
        ),
    )
    assert report.succeeded
    n_batch = chunk_token_windows(
        spark.createDataFrame(rows, "doc_id long, text string, source string"),
        window=8, stride=4,
    ).count()
    assert spark.read.parquet(stream_out).count() == n_batch
    with pytest.raises(ConfigError, match=r"batch path \(run_pipeline\)"):
        run_pipeline_streaming(
            spark,
            load_spec(
                {
                    "in": {"type": "parquet", "path": src},
                    "filters": [
                        {
                            "type": "decontaminate",
                            "benchmark": {"type": "parquet", "path": bench},
                            "id": "doc_id",
                        }
                    ],
                    "out": {"type": "parquet", "path": str(tmp_path / "nope")},
                }
            ),
        )


def test_spec_text_append_stages_dotted_column_names(spark, tmp_path):
    """Struct-pack field references survive dotted column names (the nested
    reference is backtick-quoted); a backtick IN a name is a ConfigError."""
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(0, "hello world wide web")], "`doc.id` long, `my.text` string"
    ).write.parquet(src)
    run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": src},
                "filters": [
                    {"type": "quality_score", "column": "my.text"},
                    {"type": "pii_scrub", "column": "my.text"},
                    {"type": "chunk", "column": "my.text", "window": 2, "stride": 2},
                ],
                "out": {"type": "memory", "options": {"view": "dotted"}},
            }
        ),
    )
    out = spark.table("dotted")
    assert out.columns == [
        "doc.id", "my.text", "quality", "n_email", "n_digits",
        "chunk_idx", "chunk_text", "chunk_tokens",
    ]
    assert out.count() == 2  # 4 tokens / window 2 stride 2


def test_spec_json_type_variant_pipeline(spark, tmp_path):
    """VariantType pilot (SURVEY §7.5.2, r12): `options: {json_type:
    variant}` converts declared json columns to native VARIANT after the
    read — typed access downstream, parquet sink round-trips the variant
    natively, and the batch/streaming front doors agree."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"id": 1, "doc": {"k": 7, "tags": ["a", "b"]}}\n'
        '{"id": 2, "doc": [1, 2, 3]}\n'  # heterogeneous: array in the same column
        '{"id": 3, "doc": null}\n'
    )
    out = str(tmp_path / "out")
    doc = {
        "in": {
            "type": "json",
            "path": str(src),
            "columns": [
                {"name": "id", "type": "long"},
                {"name": "doc", "type": "json"},
            ],
            "options": {"json_type": "variant"},
        },
        "filters": [
            {
                "type": "with_column",
                "name": "k",
                "expr": "variant_get(doc, '$.k', 'long')",
            }
        ],
        "out": {"type": "parquet", "path": out},
    }
    report = run_pipeline(spark, load_spec(doc))
    assert report.succeeded and report.output_rows == 3
    back = spark.read.parquet(out)
    assert dict(back.dtypes)["doc"] == "variant"
    got = {r.id: (r.k, r.txt) for r in back.selectExpr(
        "id", "k", "to_json(doc) AS txt"
    ).collect()}
    assert got[1] == (7, '{"k":7,"tags":["a","b"]}')
    assert got[2] == (None, "[1,2,3]")
    assert got[3][0] is None

    # streaming front door, same spec shape → same rows
    sout = str(tmp_path / "sout")
    sdoc = dict(doc)
    sdoc["out"] = {"type": "parquet", "path": sout}
    sreport = run_pipeline_streaming(spark, load_spec(sdoc))
    assert sreport.succeeded
    sback = spark.read.parquet(sout)
    assert dict(sback.dtypes)["doc"] == "variant"
    sgot = {r.id: (r.k, r.txt) for r in sback.selectExpr(
        "id", "k", "to_json(doc) AS txt"
    ).collect()}
    assert sgot == got


def test_spec_json_type_variant_invalid_value_policy(spark, tmp_path):
    """Value-level invalid-JSON policy mirrors the row-level policy:
    stop_on_invalid_record false → malformed value becomes NULL variant
    (skip analog); true → loud user-data failure."""
    from embulk_executor_mapreduce_spark.errors import RemoteTaskFailedDataError

    src = tmp_path / "in"
    src.mkdir()
    # the json LINES are well-formed; the json-typed COLUMN value is a
    # string whose content is not valid JSON
    (src / "a.jsonl").write_text(
        '{"id": 1, "doc": "{\\"ok\\": true}"}\n{"id": 2, "doc": "{broken"}\n'
    )
    base = {
        "in": {
            "type": "json",
            "path": str(src),
            "columns": [
                {"name": "id", "type": "long"},
                {"name": "doc", "type": "json"},
            ],
            "options": {"json_type": "variant"},
        },
    }
    out1 = str(tmp_path / "skip")
    report = run_pipeline(
        spark, load_spec({**base, "out": {"type": "parquet", "path": out1}})
    )
    assert report.succeeded
    vals = {
        r.id: r.txt
        for r in spark.read.parquet(out1)
        .selectExpr("id", "to_json(doc) AS txt")
        .collect()
    }
    assert vals == {1: '{"ok":true}', 2: None}

    strict = {**base, "out": {"type": "parquet", "path": str(tmp_path / "strict")}}
    strict["in"] = {**base["in"], "stop_on_invalid_record": True}
    with pytest.raises(RemoteTaskFailedDataError):
        run_pipeline(spark, load_spec(strict))


def test_spec_json_type_variant_config_errors(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text('{"id": 1}\n')
    with pytest.raises(ConfigError, match="json_type"):
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {
                        "type": "json",
                        "path": str(src),
                        "columns": [{"name": "id", "type": "long"}],
                        "options": {"json_type": "bogus"},
                    },
                    "out": {"type": "memory"},
                }
            ),
        )
    # variant with no json-typed columns: nothing to convert → loud
    with pytest.raises(ConfigError, match="json"):
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {
                        "type": "json",
                        "path": str(src),
                        "columns": [{"name": "id", "type": "long"}],
                        "options": {"json_type": "variant"},
                    },
                    "out": {"type": "memory"},
                }
            ),
        )


def test_spec_json_type_variant_csv_sink_renders_text(spark, tmp_path):
    """r12 review finding 1: csv/ORC sinks cannot store VARIANT — the sink
    re-serializes variant columns to canonical JSON text (to_json) instead
    of dying at write with a misclassified user-data error."""
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"id": 1, "doc": {"k": 7}}\n{"id": 2, "doc": [1, 2]}\n'
    )
    base_in = {
        "type": "json",
        "path": str(src),
        "columns": [
            {"name": "id", "type": "long"},
            {"name": "doc", "type": "json"},
        ],
        "options": {"json_type": "variant"},
    }
    for sink_type in ("csv", "orc"):
        out = str(tmp_path / f"out_{sink_type}")
        report = run_pipeline(
            spark, load_spec({"in": base_in, "out": {"type": sink_type, "path": out}})
        )
        assert report.succeeded and report.output_rows == 2
        back = getattr(
            spark.read.options(
                header=True, inferSchema=False, quote='"', escape='"'
            ),
            sink_type,
        )(out)
        got = {r.id: r.doc for r in back.collect()}
        assert got == {"1" if sink_type == "csv" else 1: '{"k":7}',
                       "2" if sink_type == "csv" else 2: "[1,2]"}
        # the commit-audit manifest must record the AS-WRITTEN type
        # (string after the variant render), not the pre-write variant
        # (r12 review finding 3)
        import json as _json
        from pathlib import Path as _Path

        man = _json.loads((_Path(out) / "_manifest.json").read_text())
        assert {c["name"]: c["type"] for c in man["columns"]}["doc"] == "string"
