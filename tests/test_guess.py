"""Schema guessing (embulk-guess analog): inference rules, the
options.guess front door, and the streaming rejection."""

from __future__ import annotations

import pytest

from embulk_executor_mapreduce_spark.errors import ConfigError
from embulk_executor_mapreduce_spark.plans.compiler import (
    compile_pipeline,
    run_pipeline_streaming,
)
from embulk_executor_mapreduce_spark.sources.guess import (
    guess_csv_schema,
    guess_ltsv_schema,
    guess_types,
)
from embulk_executor_mapreduce_spark.spec import load_spec


def test_type_precedence_rules(spark):
    df = spark.createDataFrame(
        [
            ("true", "1", "1.5", "2024-01-02 03:04:05", "2024-01-02", "x", ""),
            ("FALSE", "-7", "2", "2024-01-02 03:04:05.123456", "2024-12-31", "1", ""),
            (None, "", "1e3", "", "", "t", ""),
        ],
        "b string, l string, d string, ts string, dt string, s string, empty string",
    )
    got = {c.name: c.type for c in guess_types(df)}
    assert got == {
        "b": "boolean",
        "l": "long",       # integers stay long, not double
        "d": "double",     # '2' parses as long but '1.5'/'1e3' force double
        "ts": "timestamp",
        "dt": "date",
        "s": "string",     # mixed 'x'/'1'/'t' falls through to string
        "empty": "string", # all-null → no evidence → widest type
    }


def test_guess_csv_headered_and_headerless(spark, tmp_path):
    p = tmp_path / "csv"
    p.mkdir()
    (p / "a.csv").write_text("id,name,score\n1,alpha,2.5\n2,beta,3\n")
    cols = guess_csv_schema(spark, str(p), {"header": True})
    assert [(c.name, c.type) for c in cols] == [
        ("id", "long"), ("name", "string"), ("score", "double"),
    ]
    p2 = tmp_path / "nohdr"
    p2.mkdir()
    (p2 / "a.csv").write_text("1,alpha\n2,beta\n")
    cols = guess_csv_schema(spark, str(p2))
    assert [(c.name, c.type) for c in cols] == [("c0", "long"), ("c1", "string")]


def test_guess_ltsv_labels_and_types(spark, tmp_path):
    p = tmp_path / "ltsv"
    p.mkdir()
    (p / "a.ltsv").write_text(
        "host:a.com\tstatus:200\n"
        "host:b.com\tstatus:404\textra:1.25\n"
    )
    cols = guess_ltsv_schema(spark, str(p))
    got = {c.name: c.type for c in cols}
    assert got == {"host": "string", "status": "long", "extra": "double"}


def test_guess_front_door_compiles_like_declared(spark, tmp_path):
    p = tmp_path / "fd"
    p.mkdir()
    (p / "a.csv").write_text("id,score\n1,2.5\n2,3.5\n")
    df = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "csv",
                    "path": str(p),
                    "options": {"guess": True, "skip_header_lines": 1},
                },
                "filters": [{"type": "filter", "predicate": "score > 3"}],
                "out": {"type": "null"},
            }
        ),
    )
    assert dict(df.dtypes) == {"id": "bigint", "score": "double"}
    assert df.collect() == [(2, 3.5)]


def test_guess_is_batch_only(spark, tmp_path):
    p = tmp_path / "s"
    p.mkdir()
    (p / "a.csv").write_text("1,x\n")
    with pytest.raises(ConfigError, match="batch-only"):
        run_pipeline_streaming(
            spark,
            load_spec(
                {
                    "in": {
                        "type": "csv",
                        "path": str(p),
                        "options": {"guess": True},
                    },
                    "out": {"type": "parquet", "path": str(tmp_path / "o")},
                }
            ),
        )


def test_missing_columns_error_names_guess(spark, tmp_path):
    with pytest.raises(ConfigError, match="guess"):
        load_spec(
            {"in": {"type": "csv", "path": str(tmp_path)}, "out": {"type": "null"}}
        ).validate()


def test_guess_recovery_property(spark):
    """Property: stringified values of a KNOWN type are recovered as that
    type — hypothesis drives one combined frame through guess_types."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        longs=st.lists(
            st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=6
        ),
        bools=st.lists(st.booleans(), min_size=1, max_size=6),
        # doubles that are NOT valid longs (so the more specific type can't
        # win) and round-trip through str() unambiguously
        doubles=st.lists(
            st.floats(
                allow_nan=False,
                allow_infinity=False,
                width=64,
            ).filter(lambda x: x != int(x)),
            min_size=1,
            max_size=6,
        ),
    )
    def run(longs, bools, doubles):
        n = max(len(longs), len(bools), len(doubles))

        def pad(xs):
            return [str(xs[i % len(xs)]).lower() for i in range(n)]

        df = spark.createDataFrame(
            list(zip(pad(longs), pad(bools), pad(doubles))),
            "l string, b string, d string",
        )
        got = {c.name: c.type for c in guess_types(df)}
        assert got == {"l": "long", "b": "boolean", "d": "double"}

    run()


def test_guess_with_quarantine_path(spark, tmp_path):
    """guess + invalid_record_path must compose (r12 review finding: the
    quarantine branch bypassed the dispatch-only guess hook)."""
    from embulk_executor_mapreduce_spark.plans.compiler import run_pipeline

    p = tmp_path / "gq"
    p.mkdir()
    (p / "a.csv").write_text("id,score\n1,2.5\nbad,row,extra\n2,3.5\n")
    rep = run_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "csv",
                    "path": str(p),
                    "options": {"guess": True, "skip_header_lines": 1},
                    "invalid_record_path": str(tmp_path / "q"),
                },
                "out": {"type": "memory", "options": {"view": "gq_clean"}},
            }
        ),
    )
    assert rep.quarantined_rows == 1
    assert spark.table("gq_clean").count() == 2


def test_guess_dotted_and_weird_headers(spark, tmp_path):
    """Dotted / backticked header names must not crash inference (scratch
    renaming isolates expressions from column names)."""
    p = tmp_path / "dh"
    p.mkdir()
    (p / "a.csv").write_text("user.id,we`ird,plain\n1,x,2.5\n2,y,3.5\n")
    cols = guess_csv_schema(spark, str(p), {"header": True})
    assert [(c.name, c.type) for c in cols] == [
        ("user.id", "long"), ("we`ird", "string"), ("plain", "double"),
    ]


def test_guess_header_spelling_roundtrips_through_read(spark, tmp_path):
    """options: {guess, header: true} must make the REAL read skip the
    header line too (r12 review finding: the default csv path honors only
    skip_header_lines, so the header became a silent data row)."""
    p = tmp_path / "hs"
    p.mkdir()
    (p / "a.csv").write_text("name,score\nalpha,1.5\nbeta,2.5\n")
    df = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "csv",
                    "path": str(p),
                    "options": {"guess": True, "header": True},
                },
                "out": {"type": "null"},
            }
        ),
    )
    assert sorted(r.name for r in df.collect()) == ["alpha", "beta"]


def test_guess_null_string_matches_reader(spark, tmp_path):
    """A null_string placeholder must not demote a numeric column to
    string (r12 review finding: the guesser ignored the option the reader
    honors)."""
    p = tmp_path / "ns"
    p.mkdir()
    (p / "a.csv").write_text("1\n\\N\n2\n")
    cols = guess_csv_schema(spark, str(p), {"null_string": "\\N"})
    assert [(c.name, c.type) for c in cols] == [("c0", "long")]

    lp = tmp_path / "lns"
    lp.mkdir()
    (lp / "a.ltsv").write_text("v:1\nv:-\nv:2\n")
    from embulk_executor_mapreduce_spark.sources.guess import guess_ltsv_schema

    cols = guess_ltsv_schema(spark, str(lp), {"null_string": "-"})
    assert [(c.name, c.type) for c in cols] == [("v", "long")]


def test_guess_empty_input_and_multiline_header_errors(spark, tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ConfigError, match="empty input"):
        guess_csv_schema(spark, str(empty))
    with pytest.raises(ConfigError, match="multi-line"):
        guess_csv_schema(spark, str(empty), {"skip_header_lines": 2})


def test_guess_rejects_merge_state_path(spark, tmp_path):
    """The merge-state trap guard must fire BEFORE the sampling read."""
    state = tmp_path / "st"
    (state / "_data").mkdir(parents=True)
    (state / "_POINTER").write_text("v1")
    with pytest.raises(ConfigError, match="merge"):
        compile_pipeline(
            spark,
            load_spec(
                {
                    "in": {
                        "type": "csv",
                        "path": str(state),
                        "options": {"guess": True},
                    },
                    "out": {"type": "null"},
                }
            ),
        )


def test_guess_custom_delimiter(spark, tmp_path):
    """The embulk `delimiter` spelling reaches the sampling read through
    _csv_options — tab-separated files guess correctly."""
    p = tmp_path / "tsv"
    p.mkdir()
    (p / "a.tsv").write_text("1\tx\t2.5\n2\ty\t3.5\n")
    cols = guess_csv_schema(spark, str(p), {"delimiter": "\t"})
    assert [(c.name, c.type) for c in cols] == [
        ("c0", "long"), ("c1", "string"), ("c2", "double"),
    ]


def test_guess_ltsv_front_door(spark, tmp_path):
    """options: {guess: true} on an LTSV source block compiles end-to-end."""
    p = tmp_path / "lfd"
    p.mkdir()
    (p / "a.ltsv").write_text("host:a\tstatus:200\nhost:b\tstatus:404\n")
    df = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "ltsv", "path": str(p), "options": {"guess": True}},
                "filters": [{"type": "filter", "predicate": "status >= 400"}],
                "out": {"type": "null"},
            }
        ),
    )
    assert dict(df.dtypes) == {"host": "string", "status": "bigint"}
    assert df.collect() == [("b", 404)]


def test_guess_ltsv_absent_label_with_nondefault_null_string(spark, tmp_path):
    """r12 advisor finding: an ABSENT label must be NULL in the guess sample
    (presence-gated extraction, exactly as the reader) — with a non-default
    null_string, a bare regexp_extract returned '' for the absent label,
    which read as an unparseable non-null value and forced string, while
    the reader itself parsed the column as long."""
    p = tmp_path / "absent"
    p.mkdir()
    (p / "a.ltsv").write_text(
        "host:a\tstatus:200\n"
        "host:b\n"  # status absent entirely — must stay NULL for the guess
        "host:c\tstatus:NULLVAL\n"
    )
    cols = guess_ltsv_schema(
        spark, str(p), {"null_string": "NULLVAL"}
    )
    assert [(c.name, c.type) for c in cols] == [
        ("host", "string"),
        ("status", "long"),
    ]


def test_guess_jsonl_types(spark, tmp_path):
    """r13 jsonl unification (VERDICT r12 missing #3): the same fused
    counting aggregate infers jsonl columns — real JSON nulls, absent keys
    NULL by map semantics, all-object/array columns → the engine's `json`
    type, mixed scalar/object → string (no consensus)."""
    from embulk_executor_mapreduce_spark.sources.guess import (
        guess_jsonl_schema,
    )

    p = tmp_path / "jl"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"i":1,"f":2.5,"b":true,"t":"2024-01-02 03:04:05","d":"2024-01-02",'
        '"s":"x","o":{"k":1},"mix":3,"nul":null,"qn":"8080","qb":"true",'
        '"es":""}\n'
        "not json at all\n"  # structurally invalid: excluded from sample
        '{"i":-7,"b":false,"t":"2024-01-02 03:04:06.123456","d":"2024-12-31",'
        '"s":"1","o":[1,2],"mix":{"z":9},"qn":"404","qb":"false","es":5}\n'
    )
    got = {c.name: c.type for c in guess_jsonl_schema(spark, str(p))}
    assert got == {
        "i": "long",
        "f": "double",
        "b": "boolean",
        "t": "timestamp",
        "d": "date",
        "s": "string",
        "o": "json",
        "mix": "string",
        "nul": "string",
        # r13 review findings: JSON-native tags rule — quoted scalars stay
        # string (a long/boolean guess would corrupt the typed read), and
        # an empty string is STRING evidence, not a null
        "qn": "string",
        "qb": "string",
        "es": "string",
    }


def test_guess_jsonl_label_order_first_seen(spark, tmp_path):
    p = tmp_path / "ord"
    p.mkdir()
    (p / "a.jsonl").write_text('{"z":1,"a":2}\n{"a":3,"m":4}\n')
    from embulk_executor_mapreduce_spark.sources.guess import (
        guess_jsonl_schema,
    )

    assert [c.name for c in guess_jsonl_schema(spark, str(p))] == ["z", "a", "m"]


def test_guess_jsonl_front_door(spark, tmp_path):
    """options: {guess: true} on a json source block compiles end-to-end
    and the guessed timestamp/typed columns parse through the real read."""
    p = tmp_path / "jfd"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"host":"a","status":200,"at":"2024-01-02 03:04:05"}\n'
        '{"host":"b","status":404,"at":"2024-01-02 03:04:06.123456"}\n'
    )
    df = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "json", "path": str(p), "options": {"guess": True}},
                "filters": [{"type": "filter", "predicate": "status >= 400"}],
                "out": {"type": "null"},
            }
        ),
    )
    assert dict(df.dtypes) == {
        "host": "string",
        "status": "bigint",
        "at": "timestamp",
    }
    [r] = df.collect()
    assert (r["host"], r["status"], str(r["at"])) == (
        "b",
        404,
        "2024-01-02 03:04:06.123456",
    )


def test_guess_jsonl_streaming_rejected(spark, tmp_path):
    p = tmp_path / "js"
    p.mkdir()
    (p / "a.jsonl").write_text('{"a":1}\n')
    with pytest.raises(ConfigError, match="batch-only"):
        run_pipeline_streaming(
            spark,
            load_spec(
                {
                    "in": {
                        "type": "json",
                        "path": str(p),
                        "options": {"guess": True},
                    },
                    "out": {"type": "null"},
                }
            ),
        )


def test_guess_jsonl_empty_input_raises(spark, tmp_path):
    p = tmp_path / "je"
    p.mkdir()
    (p / "a.jsonl").write_text("\n")
    from embulk_executor_mapreduce_spark.sources.guess import (
        guess_jsonl_schema,
    )

    with pytest.raises(ConfigError, match="cannot guess"):
        guess_jsonl_schema(spark, str(p))


def test_guess_jsonl_with_quarantine_split(spark, tmp_path):
    """options.guess composes with invalid_record_path on a json source:
    the guess resolves from the parseable sample, the typed read keeps the
    clean rows, and the malformed line lands in the quarantine table."""
    from embulk_executor_mapreduce_spark.plans.compiler import run_pipeline

    p = tmp_path / "jq"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"host":"a","status":200}\n'
        "this is not json\n"
        '{"host":"b","status":404}\n'
    )
    out = tmp_path / "out"
    q = tmp_path / "quarantine"
    run_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "json",
                    "path": str(p),
                    "options": {"guess": True},
                    "invalid_record_path": str(q),
                },
                "out": {"type": "parquet", "path": str(out)},
            }
        ),
    )
    clean = spark.read.parquet(str(out))
    assert dict(clean.dtypes) == {"host": "string", "status": "bigint"}
    assert sorted((r["host"], r["status"]) for r in clean.collect()) == [
        ("a", 200),
        ("b", 404),
    ]
    bad = spark.read.json(str(q)).collect()
    assert len(bad) == 1 and "not json" in bad[0]["raw_record"]


def test_guess_jsonl_duplicate_key_lines_excluded(spark, tmp_path):
    """A line with a duplicate key inside one object is AMBIGUOUS evidence
    (Spark's map views resolve duplicates inconsistently — probed) and is
    excluded from the guess sample; the remaining lines decide the type.
    The typed READ of a duplicate-key line resolves last-wins under the
    normal invalid-record policy."""
    from embulk_executor_mapreduce_spark.sources.guess import (
        guess_jsonl_schema,
    )

    p = tmp_path / "dup"
    p.mkdir()
    # the dup line's first occurrence is a string — were it counted, the
    # column would fall to string; exclusion leaves the clean line's long
    (p / "a.jsonl").write_text('{"a":"x","a":2}\n{"a":3}\n')
    assert [(c.name, c.type) for c in guess_jsonl_schema(spark, str(p))] == [
        ("a", "long")
    ]


def test_guess_jsonl_recovery_property(spark):
    """Property (the csv twin of test_guess_recovery_property): JSON-native
    values of a KNOWN type are recovered as that type, and quoted versions
    of the same values are recovered as STRING — the tag-aware rule that
    keeps the guess aligned with what the typed read can actually parse."""
    import json as _json

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from embulk_executor_mapreduce_spark.sources.guess import (
        guess_jsonl_schema,
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        longs=st.lists(
            st.integers(min_value=-(2**62), max_value=2**62),
            min_size=1,
            max_size=5,
        ),
        bools=st.lists(st.booleans(), min_size=1, max_size=5),
    )
    def run(longs, bools):
        import tempfile

        d = tempfile.mkdtemp(prefix="guess_prop_")
        n = max(len(longs), len(bools))
        with open(f"{d}/a.jsonl", "w") as f:
            for i in range(n):
                f.write(
                    _json.dumps(
                        {
                            "l": longs[i % len(longs)],
                            "b": bools[i % len(bools)],
                            "ql": str(longs[i % len(longs)]),
                            "qb": str(bools[i % len(bools)]).lower(),
                        }
                    )
                    + "\n"
                )
        got = {c.name: c.type for c in guess_jsonl_schema(spark, d)}
        assert got == {
            "l": "long",
            "b": "boolean",
            "ql": "string",
            "qb": "string",
        }

    run()
