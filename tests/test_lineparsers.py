"""LTSV + regex parser sources and the ltsv/text sinks.

Model: the csv invalid-record-policy matrix in test_retry_and_csv_parity.py
(reference ``TestMapReduceExecutor.java:177-192`` — stop fails the load as
user-data, skip drops bad records) applied to the two parser-plugin analogs,
plus the parser-specific semantics: first-wins duplicate labels, colon-laden
values, quarantine layout parity, streaming parity, and the config matrix.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from embulk_executor_mapreduce_spark.errors import (
    ConfigError,
    RemoteTaskFailedDataError,
)
from embulk_executor_mapreduce_spark.plans.compiler import (
    compile_pipeline,
    run_pipeline,
    run_pipeline_streaming,
)
from embulk_executor_mapreduce_spark.spec import load_spec

LTSV_COLS = [
    {"name": "host", "type": "string"},
    {"name": "time", "type": "timestamp"},
    {"name": "status", "type": "long"},
    {"name": "msg", "type": "string"},
]


@pytest.fixture()
def ltsv_dir(tmp_path):
    p = tmp_path / "ltsv_src"
    p.mkdir()
    (p / "a.ltsv").write_text(
        "host:a.com\ttime:2024-01-02 03:04:05.123456\tstatus:200\tmsg:x:y z\n"
        "host:b.com\tstatus:abc\tmsg:m\n"  # typed failure (status)
        "garbage no colon\thost:c.com\n"  # structural failure
        "host:d.com\thost:e.com\tstatus:404\n"  # duplicate label
    )
    return str(p)


def _ltsv_spec(path, **src_extra):
    return load_spec(
        {
            "in": {"type": "ltsv", "path": path, "columns": LTSV_COLS, **src_extra},
            "out": {"type": "null"},
        }
    )


def test_ltsv_skip_semantics(spark, ltsv_dir):
    rows = compile_pipeline(spark, _ltsv_spec(ltsv_dir)).orderBy("host").collect()
    assert [r.host for r in rows] == ["a.com", "d.com"]
    good = rows[0]
    assert good.status == 200
    assert str(good.time) == "2024-01-02 03:04:05.123456"
    assert good.msg == "x:y z"  # first colon splits, the rest is value
    dup = rows[1]
    assert dup.status == 404 and dup.time is None and dup.msg is None


def test_ltsv_stop_raises_user_data(spark, ltsv_dir):
    with pytest.raises(RemoteTaskFailedDataError):
        run_pipeline(spark, _ltsv_spec(ltsv_dir, stop_on_invalid_record=True))


def test_ltsv_quarantine_split(spark, ltsv_dir, tmp_path):
    qdir = str(tmp_path / "quar")
    spec = load_spec(
        {
            "in": {
                "type": "ltsv",
                "path": ltsv_dir,
                "columns": LTSV_COLS,
                "invalid_record_path": qdir,
            },
            "out": {"type": "memory", "options": {"view": "ltsv_clean"}},
        }
    )
    report = run_pipeline(spark, spec)
    assert report.succeeded
    assert report.quarantined_rows == 2
    quar = spark.read.json(qdir)
    assert sorted(quar.columns) == ["input_file", "partial_parse", "raw_record"]
    raws = {r.raw_record for r in quar.collect()}
    assert any("status:abc" in r for r in raws)
    assert any("garbage no colon" in r for r in raws)
    assert spark.table("ltsv_clean").count() == 2


def test_ltsv_reserved_and_missing_columns(spark, tmp_path):
    with pytest.raises(ConfigError, match="reserved"):
        compile_pipeline(
            spark,
            load_spec(
                {
                    "in": {
                        "type": "ltsv",
                        "path": str(tmp_path),
                        "columns": [{"name": "__line", "type": "string"}],
                    },
                    "out": {"type": "null"},
                }
            ),
        )
    with pytest.raises(ConfigError, match="columns"):
        load_spec(
            {"in": {"type": "ltsv", "path": str(tmp_path)}, "out": {"type": "null"}}
        ).validate()


def test_ltsv_declared_value_column_no_collision(spark, tmp_path):
    """A declared column literally named `value` (the text reader's own line
    column) must parse cleanly — the raw line rides under a reserved name."""
    p = tmp_path / "v"
    p.mkdir()
    (p / "a.ltsv").write_text("value:42\tk:x\n")
    df = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "ltsv",
                    "path": str(p),
                    "columns": [
                        {"name": "value", "type": "long"},
                        {"name": "k", "type": "string"},
                    ],
                },
                "out": {"type": "null"},
            }
        ),
    )
    assert df.collect() == [(42, "x")]


def test_ltsv_sink_roundtrip_and_tab_rejection(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "a b", 2.5), (2, None, -0.125)], ["id", "s", "v"]
    )
    out = str(tmp_path / "out")
    from embulk_executor_mapreduce_spark.sinks.writer import write_sink
    from embulk_executor_mapreduce_spark.spec import load_spec as _ls

    write_sink(src, _ls({"in": {"type": "task"}, "out": {"type": "ltsv", "path": out}}).sink)
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
    got = {tuple(r) for r in back.collect()}
    assert got == {(1, "a b", 2.5), (2, None, -0.125)}

    # a tab inside a value is unrepresentable in LTSV → loud user-data raise
    bad = spark.createDataFrame([(1, "has\ttab")], ["id", "s"])
    with pytest.raises(Exception, match="tab/newline"):
        write_sink(
            bad,
            _ls({"in": {"type": "task"}, "out": {"type": "ltsv", "path": str(tmp_path / 'bad')}}).sink,
        )


def test_ltsv_streaming_matches_batch(spark, ltsv_dir, tmp_path):
    out_b = str(tmp_path / "batch_out")
    out_s = str(tmp_path / "stream_out")

    def spec_for(out):
        return load_spec(
            {
                "in": {"type": "ltsv", "path": ltsv_dir, "columns": LTSV_COLS},
                "filters": [{"type": "filter", "predicate": "status >= 200"}],
                "out": {"type": "parquet", "path": out},
            }
        )

    run_pipeline(spark, spec_for(out_b))
    run_pipeline_streaming(spark, spec_for(out_s))
    b = {tuple(r) for r in spark.read.parquet(out_b).collect()}
    s = {tuple(r) for r in spark.read.parquet(out_s).collect()}
    assert b == s and len(b) == 2


REGEX_COLS = [
    {"name": "event_id", "type": "long"},
    {"name": "event_type", "type": "string"},
    {"name": "v", "type": "long"},
]
PATTERN = r"^(\d+) \[(\w+)\] v=(-?\d+)$"


@pytest.fixture()
def regex_dir(tmp_path):
    p = tmp_path / "rx_src"
    p.mkdir()
    (p / "a.log").write_text(
        "127 [click] v=9\nbadline\n128 [view] v=-3\n"
    )
    return str(p)


def test_regex_skip_and_types(spark, regex_dir):
    df = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "regex",
                    "path": regex_dir,
                    "options": {"pattern": PATTERN},
                    "columns": REGEX_COLS,
                },
                "out": {"type": "null"},
            }
        ),
    )
    rows = sorted(df.collect())
    assert rows == [(127, "click", 9), (128, "view", -3)]
    assert dict(df.dtypes) == {
        "event_id": "bigint",
        "event_type": "string",
        "v": "bigint",
    }


def test_regex_stop_raises_user_data(spark, regex_dir):
    with pytest.raises(RemoteTaskFailedDataError):
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {
                        "type": "regex",
                        "path": regex_dir,
                        "options": {"pattern": PATTERN},
                        "columns": REGEX_COLS,
                        "stop_on_invalid_record": True,
                    },
                    "out": {"type": "null"},
                }
            ),
        )


def test_regex_config_matrix(spark, tmp_path):
    # missing pattern
    with pytest.raises(ConfigError, match="pattern"):
        load_spec(
            {
                "in": {
                    "type": "regex",
                    "path": str(tmp_path),
                    "columns": REGEX_COLS,
                },
                "out": {"type": "null"},
            }
        ).validate()
    # too few capture groups for the declared schema
    with pytest.raises(ConfigError, match="capture group"):
        load_spec(
            {
                "in": {
                    "type": "regex",
                    "path": str(tmp_path),
                    "options": {"pattern": r"^(\d+)$"},
                    "columns": REGEX_COLS,
                },
                "out": {"type": "null"},
            }
        ).validate()
    # missing columns
    with pytest.raises(ConfigError, match="columns"):
        load_spec(
            {
                "in": {
                    "type": "regex",
                    "path": str(tmp_path),
                    "options": {"pattern": r"^(\d+)$"},
                },
                "out": {"type": "null"},
            }
        ).validate()


def test_regex_quarantine(spark, regex_dir, tmp_path):
    qdir = str(tmp_path / "rxquar")
    report = run_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "regex",
                    "path": regex_dir,
                    "options": {"pattern": PATTERN},
                    "columns": REGEX_COLS,
                    "invalid_record_path": qdir,
                },
                "out": {"type": "memory", "options": {"view": "rx_clean"}},
            }
        ),
    )
    assert report.quarantined_rows == 1
    assert spark.read.json(qdir).collect()[0].raw_record == "badline"
    assert spark.table("rx_clean").count() == 2


def test_regex_streaming_matches_batch(spark, regex_dir, tmp_path):
    out = str(tmp_path / "rx_stream")
    run_pipeline_streaming(
        spark,
        load_spec(
            {
                "in": {
                    "type": "regex",
                    "path": regex_dir,
                    "options": {"pattern": PATTERN},
                    "columns": REGEX_COLS,
                },
                "out": {"type": "parquet", "path": out},
            }
        ),
    )
    assert {tuple(r) for r in spark.read.parquet(out).collect()} == {
        (127, "click", 9),
        (128, "view", -3),
    }


def test_text_sink_guard_and_write(spark, tmp_path):
    from embulk_executor_mapreduce_spark.sinks.writer import write_sink

    out = str(tmp_path / "txt")
    df = spark.createDataFrame([("l1",), ("l2",)], ["line"])
    write_sink(
        df,
        load_spec({"in": {"type": "task"}, "out": {"type": "text", "path": out}}).sink,
    )
    assert {r.value for r in spark.read.text(out).collect()} == {"l1", "l2"}

    two_cols = spark.createDataFrame([(1, "x")], ["a", "b"])
    with pytest.raises(ConfigError, match="exactly one string payload"):
        write_sink(
            two_cols,
            load_spec(
                {"in": {"type": "task"}, "out": {"type": "text", "path": out}}
            ).sink,
        )


def test_parquet_bloom_filter_sink_option(spark, tmp_path):
    """`bloom_filters` writes real parquet bloom filters (observable as a
    file-size delta on a high-cardinality column — parquet-mr skips blooms
    on fully dictionary-encoded chunks, so md5 keys force plain encoding)
    and rejects unknown columns at plan time."""
    import glob
    import os

    from embulk_executor_mapreduce_spark.sinks.writer import write_sink

    df = (
        spark.range(50000)
        .selectExpr("md5(cast(id as string)) as k", "id")
        .coalesce(1)
    )
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    write_sink(df, load_spec({"in": {"type": "task"}, "out": {"type": "parquet", "path": plain}}).sink)
    write_sink(
        df,
        load_spec(
            {
                "in": {"type": "task"},
                "out": {
                    "type": "parquet",
                    "path": bloomed,
                    "options": {"bloom_filters": {"k": 50000}},
                },
            }
        ).sink,
    )
    size = lambda d: sum(
        os.path.getsize(f) for f in glob.glob(f"{d}/*.parquet")
    )
    assert size(bloomed) > size(plain) + 10_000
    # bloomed output still reads back identically
    assert spark.read.parquet(bloomed).count() == 50000

    with pytest.raises(ConfigError, match="unknown column"):
        write_sink(
            df,
            load_spec(
                {
                    "in": {"type": "task"},
                    "out": {
                        "type": "parquet",
                        "path": str(tmp_path / "x"),
                        "options": {"bloom_filters": ["nope"]},
                    },
                }
            ).sink,
        )


def test_orc_bloom_filter_sink_option(spark, tmp_path):
    import glob
    import os

    from embulk_executor_mapreduce_spark.sinks.writer import write_sink

    df = (
        spark.range(50000)
        .selectExpr("md5(cast(id as string)) as k", "id")
        .coalesce(1)
    )
    plain, bloomed = str(tmp_path / "p"), str(tmp_path / "b")
    write_sink(df, load_spec({"in": {"type": "task"}, "out": {"type": "orc", "path": plain}}).sink)
    write_sink(
        df,
        load_spec(
            {
                "in": {"type": "task"},
                "out": {
                    "type": "orc",
                    "path": bloomed,
                    "options": {"bloom_filters": ["k"]},
                },
            }
        ).sink,
    )
    size = lambda d: sum(os.path.getsize(f) for f in glob.glob(f"{d}/*.orc"))
    assert size(bloomed) > size(plain) + 10_000
    assert spark.read.orc(bloomed).count() == 50000


def test_blank_lines_skipped_under_every_policy(spark, tmp_path):
    """Interior blank lines must not fabricate all-NULL rows (r12 review
    finding) — skipped silently like Spark's csv reader, under skip AND
    stop AND quarantine policies, for both parsers."""
    p = tmp_path / "blank"
    p.mkdir()
    (p / "a.ltsv").write_text("host:a.com\tstatus:200\n\nhost:b.com\tstatus:404\n")
    cols = [{"name": "host", "type": "string"}, {"name": "status", "type": "long"}]
    for stop in (False, True):
        df = compile_pipeline(
            spark,
            load_spec(
                {
                    "in": {
                        "type": "ltsv",
                        "path": str(p),
                        "columns": cols,
                        "stop_on_invalid_record": stop,
                    },
                    "out": {"type": "null"},
                }
            ),
        )
        assert sorted(r.host for r in df.collect()) == ["a.com", "b.com"]
    qdir = str(tmp_path / "q")
    rep = run_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "ltsv",
                    "path": str(p),
                    "columns": cols,
                    "invalid_record_path": qdir,
                },
                "out": {"type": "memory", "options": {"view": "blank_clean"}},
            }
        ),
    )
    assert rep.quarantined_rows == 0
    assert spark.table("blank_clean").count() == 2

    rxp = tmp_path / "blankrx"
    rxp.mkdir()
    (rxp / "a.log").write_text("1 [x] v=1\n\n2 [y] v=2\n")
    df = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "regex",
                    "path": str(rxp),
                    "options": {"pattern": r"^(\d+) \[(\w+)\] v=(-?\d+)$"},
                    "columns": REGEX_COLS,
                    "stop_on_invalid_record": True,  # blank must not raise
                },
                "out": {"type": "null"},
            }
        ),
    )
    assert df.count() == 2


def test_streaming_reserved_column_raises_config(spark, tmp_path):
    """The reserved-name check must fire on the STREAMING path too (r12
    review finding: it lived in the batch-only reader)."""
    p = tmp_path / "resv"
    p.mkdir()
    (p / "a.ltsv").write_text("__line:1\n")
    with pytest.raises(ConfigError, match="reserved"):
        run_pipeline_streaming(
            spark,
            load_spec(
                {
                    "in": {
                        "type": "ltsv",
                        "path": str(p),
                        "columns": [{"name": "__line", "type": "string"}],
                    },
                    "out": {"type": "parquet", "path": str(tmp_path / "o")},
                }
            ),
        )


def test_orc_bloom_rejects_ndv_sizing(spark, tmp_path):
    from embulk_executor_mapreduce_spark.sinks.writer import write_sink

    df = spark.range(10).selectExpr("cast(id as string) k")
    with pytest.raises(ConfigError, match="parquet-only"):
        write_sink(
            df,
            load_spec(
                {
                    "in": {"type": "task"},
                    "out": {
                        "type": "orc",
                        "path": str(tmp_path / "o"),
                        "options": {"bloom_filters": {"k": 1000}},
                    },
                }
            ).sink,
        )


def test_ltsv_edge_values_and_anchoring(spark, tmp_path):
    """Pins observed edge behavior so it can't drift silently:
    - a label that is a SUFFIX of another ('ost' vs 'host') extracts its
      own value — the (?:^|\\t) anchor prevents mid-token matches;
    - '+5' casts to long, ' 2.5 ' trims to double, NaN/Infinity parse as
      doubles (Spark cast semantics — the csv reader agrees);
    - CRLF files read cleanly (no trailing \\r pollution)."""
    p = tmp_path / "edge"
    p.mkdir()
    (p / "a.ltsv").write_bytes(
        b"host:x\tost:y\tn:+5\td: 2.5 \te:NaN\tinf:Infinity\r\n"
    )
    df = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "ltsv",
                    "path": str(p),
                    "columns": [
                        {"name": "ost", "type": "string"},
                        {"name": "n", "type": "long"},
                        {"name": "d", "type": "double"},
                        {"name": "e", "type": "double"},
                        {"name": "inf", "type": "double"},
                    ],
                },
                "out": {"type": "null"},
            }
        ),
    )
    import math

    [r] = df.collect()
    assert r.ost == "y" and r.n == 5 and r.d == 2.5
    assert math.isnan(r.e) and math.isinf(r.inf)


def test_ltsv_record_level_skip_on_any_bad_column(spark, tmp_path):
    """One unparseable declared column drops the WHOLE record (csv
    PERMISSIVE parity), never a partial row with that field nulled."""
    p = tmp_path / "rl"
    p.mkdir()
    (p / "a.ltsv").write_text("a:1\tb:ok\n" "a:0x1A\tb:also\n")
    df = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "ltsv",
                    "path": str(p),
                    "columns": [
                        {"name": "a", "type": "long"},
                        {"name": "b", "type": "string"},
                    ],
                },
                "out": {"type": "null"},
            }
        ),
    )
    assert df.collect() == [(1, "ok")]


def test_ltsv_label_containing_backslash_e(spark, tmp_path):
    r"""r12 advisor finding: a column name containing a literal \E used to
    terminate the \Q..\E quote and leak the remainder into the pattern as
    raw regex. _rx_literal split-and-requotes, so the label stays literal."""
    p = tmp_path / "qe"
    p.mkdir()
    (p / "a.ltsv").write_text("a\\Eb:7\tok:yes\n")
    df = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "ltsv",
                    "path": str(p),
                    "columns": [
                        {"name": "a\\Eb", "type": "long"},
                        {"name": "ok", "type": "string"},
                    ],
                },
                "out": {"type": "null"},
            }
        ),
    )
    assert df.collect() == [(7, "yes")]
