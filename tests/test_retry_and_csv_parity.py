"""O14 retry_tasks semantics, O2 csv parity gaps (per-column timestamp
formats, skip_header_lines > 1), and the reference's minimum-slice e2e
fixture ported verbatim in shape (TEST/resources/config/embulk_mapred_config.yml
+ TestMapReduceExecutor.java:311-331)."""

from __future__ import annotations

import pandas as pd
import pytest

from embulk_executor_mapreduce_spark.errors import (
    RemoteTaskFailedDataError,
    RemoteTaskFailedError,
)
from embulk_executor_mapreduce_spark.plans.compiler import run_pipeline
from embulk_executor_mapreduce_spark.sources.readers import register_task_source
from embulk_executor_mapreduce_spark.spec import load_spec

# ---------------------------------------------------------------------------
# O14 retry_tasks (reference EmbulkMapReduce.java:586-599: false → record the
# exception and continue; true → rethrow so the framework retries/fails;
# partitioned mappers always rethrow, EmbulkPartitioningMapReduce.java:132-141)
# ---------------------------------------------------------------------------

TASK_COLS = [{"name": "task_index", "type": "long"}, {"name": "i", "type": "long"}]


def _register_poisoned():
    # defined as a closure so cloudpickle ships it by VALUE — a module-level
    # function in a test file is pickled by reference and the executor-side
    # Python worker cannot import the test module
    def poisoned(task_index: int):
        import pandas as _pd

        if task_index == 2:
            raise ValueError(f"poisoned input task {task_index}")
        yield _pd.DataFrame({"task_index": task_index, "i": range(100)})

    register_task_source("poisoned4", poisoned)


_register_poisoned()


def _task_spec(retry_tasks: bool, partitioned: bool = False):
    doc = {
        "in": {
            "type": "task",
            "task_count": 4,
            "options": {"task_fn": "poisoned4"},
            "columns": TASK_COLS,
        },
        "out": {"type": "null"},
        "exec": {"retry_tasks": retry_tasks},
    }
    if partitioned:
        doc["filters"] = [
            {"type": "with_column", "name": "ts", "expr": "timestamp_seconds(i * 3600)"}
        ]
        doc["exec"]["partitioning"] = {"column": "ts", "unit": "hour"}
        doc["exec"]["reducers"] = 2
    return load_spec(doc)


def test_retry_tasks_false_records_and_continues(spark):
    """Default semantics: the poisoned task is recorded-and-skipped; the other
    three tasks' records survive, and the report carries the evidence."""
    report = run_pipeline(spark, _task_spec(retry_tasks=False))
    assert report.succeeded
    assert len(report.failed_tasks) == 1
    idx, err = report.failed_tasks[0]
    assert idx == 2 and "poisoned input task 2" in err


def test_retry_tasks_false_keeps_good_task_rows(spark, tmp_path):
    out = str(tmp_path / "out")
    spec = load_spec(
        {
            "in": {
                "type": "task",
                "task_count": 4,
                "options": {"task_fn": "poisoned4"},
                "columns": TASK_COLS,
            },
            "out": {"type": "parquet", "path": out},
            "exec": {"retry_tasks": False},
        }
    )
    report = run_pipeline(spark, spec)
    assert report.succeeded and report.output_rows == 300  # 3 of 4 tasks
    survivors = {r.task_index for r in spark.read.parquet(out).collect()}
    assert survivors == {0, 1, 3}


def test_retry_tasks_true_propagates(spark):
    """retry_tasks=true: the failure reaches the driver (Spark retried the
    task per spark.task.maxFailures first) and the job fails."""
    with pytest.raises((RemoteTaskFailedError, RemoteTaskFailedDataError)):
        run_pipeline(spark, _task_spec(retry_tasks=True))


def test_partitioned_pipeline_always_propagates(spark):
    """Partitioned mappers must not swallow failures even under
    retry_tasks=false — reducers would start on missing input."""
    with pytest.raises((RemoteTaskFailedError, RemoteTaskFailedDataError)):
        run_pipeline(spark, _task_spec(retry_tasks=False, partitioned=True))


# ---------------------------------------------------------------------------
# O2 csv parity: per-column timestamp formats + skip_header_lines N
# (reference embulk_mapred_config.yml:14-37 declares a format per column and
# arbitrary skip_header_lines)
# ---------------------------------------------------------------------------


def test_csv_two_timestamp_formats(spark, tmp_path):
    """Two timestamp columns with DIFFERENT declared formats both parse with
    their own format (round 1 applied only the first format globally)."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.csv").write_text(
        "2024-01-15 10:30:00,15/01/2024 10:30,7\n2024-02-01 00:00:59,01/02/2024 00:00,8\n"
    )
    cols = [
        {"name": "t_iso", "type": "timestamp", "format": "%Y-%m-%d %H:%M:%S"},
        {"name": "t_eu", "type": "timestamp", "format": "%d/%m/%Y %H:%M"},
        {"name": "n", "type": "long"},
    ]
    out = str(tmp_path / "out")
    rep = run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "csv", "path": str(src), "columns": cols},
                "out": {"type": "parquet", "path": out},
            }
        ),
    )
    assert rep.succeeded and rep.output_rows == 2
    rows = {r.n: r for r in spark.read.parquet(out).collect()}
    assert rows[7].t_iso.isoformat() == "2024-01-15T10:30:00"
    assert rows[7].t_eu.isoformat() == "2024-01-15T10:30:00"
    assert rows[8].t_iso.second == 59 and rows[8].t_eu.day == 1 and rows[8].t_eu.month == 2


def test_csv_formatter_newline_crlf_roundtrip(spark, tmp_path):
    """Reference formatter options (embulk_mapred_config.yml:42-50) on the
    csv SINK: symbolic newline CRLF + charset + delimiter become the literal
    Spark writer options, the written bytes actually end lines with \\r\\n,
    and the engine's own csv source (newline: CRLF accepted symbolically)
    reads the files back to the same multiset."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.csv").write_text("alpha,1\r\nbeta,2\r\ngamma,3\r\n")
    cols = [{"name": "s", "type": "string"}, {"name": "n", "type": "long"}]
    out = str(tmp_path / "out")
    rep = run_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "csv",
                    "path": str(src),
                    "columns": cols,
                    "newline": "CRLF",
                    "charset": "UTF-8",
                },
                "out": {
                    "type": "csv",
                    "path": out,
                    "newline": "CRLF",
                    "charset": "UTF-8",
                    "delimiter": ";",
                    "header": False,
                },
            }
        ),
    )
    assert rep.succeeded and rep.output_rows == 3
    from pathlib import Path

    raw = b"".join(p.read_bytes() for p in sorted(Path(out).glob("part-*")))
    assert b"\r\n" in raw and b";" in raw
    back = {
        tuple(line.split(";"))
        for line in raw.decode().replace("\r\n", "\n").strip().split("\n")
    }
    assert back == {("alpha", "1"), ("beta", "2"), ("gamma", "3")}


def test_csv_bad_per_column_timestamp_stop_on_invalid(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.csv").write_text("2024-01-15 10:30:00,not-a-date,1\n")
    cols = [
        {"name": "t_iso", "type": "timestamp", "format": "%Y-%m-%d %H:%M:%S"},
        {"name": "t_eu", "type": "timestamp", "format": "%d/%m/%Y %H:%M"},
        {"name": "n", "type": "long"},
    ]
    spec = load_spec(
        {
            "in": {
                "type": "csv",
                "path": str(src),
                "columns": cols,
                "stop_on_invalid_record": True,
            },
            "out": {"type": "null"},
        }
    )
    with pytest.raises(RemoteTaskFailedDataError):
        run_pipeline(spark, spec)


def test_csv_skip_header_lines_3(spark, tmp_path):
    """Arbitrary-N header skipping, applied per file (reference supports any
    N; Spark's header option only skips one)."""
    src = tmp_path / "src"
    src.mkdir()
    header = "# generated\n# by a tool\nid,name\n"
    (src / "a.csv").write_text(header + "1,alpha\n2,beta\n")
    (src / "b.csv").write_text(header + "3,gamma\n")
    cols = [{"name": "id", "type": "long"}, {"name": "name", "type": "string"}]
    out = str(tmp_path / "out")
    rep = run_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "csv",
                    "path": str(src),
                    "columns": cols,
                    "options": {"skip_header_lines": 3},
                },
                "out": {"type": "parquet", "path": out},
            }
        ),
    )
    assert rep.succeeded and rep.output_rows == 3
    got = sorted((r.id, r.name) for r in spark.read.parquet(out).collect())
    assert got == [(1, "alpha"), (2, "beta"), (3, "gamma")]


def test_csv_skip_header_lines_multisplit_file(spark, tmp_path):
    """A file larger than maxPartitionBytes scans as MULTIPLE splits; the
    per-file skip must still drop exactly the header lines. Ordering inside
    the skip window is (file_block_start, monotonic id) — ordering by the
    monotonic id alone only works while Spark happens to pack a file's
    splits in offset order (ADVICE r2)."""
    src = tmp_path / "src"
    src.mkdir()
    n_rows = 5000
    body = "".join(f"{i},name_{i:06d}\n" for i in range(n_rows))
    (src / "big.csv").write_text("# h1\n# h2\nid,name\n" + body)
    cols = [{"name": "id", "type": "long"}, {"name": "name", "type": "string"}]
    out = str(tmp_path / "out")
    conf = spark.conf
    prev_mpb = conf.get("spark.sql.files.maxPartitionBytes")
    prev_open = conf.get("spark.sql.files.openCostInBytes")
    try:
        conf.set("spark.sql.files.maxPartitionBytes", "8192")
        conf.set("spark.sql.files.openCostInBytes", "0")
        rep = run_pipeline(
            spark,
            load_spec(
                {
                    "in": {
                        "type": "csv",
                        "path": str(src),
                        "columns": cols,
                        "options": {"skip_header_lines": 3},
                    },
                    "out": {"type": "parquet", "path": out},
                }
            ),
        )
    finally:
        conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)
        conf.set("spark.sql.files.openCostInBytes", prev_open)
    assert rep.succeeded and rep.output_rows == n_rows
    got = spark.read.parquet(out)
    assert got.count() == n_rows
    ids = [r.id for r in got.select("id").collect()]
    assert sorted(ids) == list(range(n_rows))  # every data row, no header leak


def test_csv_skip_header_lines_3_invalid_record_policies(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.csv").write_text("h1\nh2\nh3\n1,alpha\nbad_row_no_number,x\n3,gamma\n")
    cols = [{"name": "id", "type": "long"}, {"name": "name", "type": "string"}]
    base = {
        "type": "csv",
        "path": str(src),
        "columns": cols,
        "options": {"skip_header_lines": 3},
    }
    rep = run_pipeline(
        spark,
        load_spec({"in": dict(base), "out": {"type": "memory"}}),
    )
    assert rep.succeeded
    assert rep.output_rows == 2  # eager memory sink observes the write pass
    assert spark.table("pipeline_out").count() == 2  # bad row skipped
    with pytest.raises(RemoteTaskFailedDataError):
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {**base, "stop_on_invalid_record": True},
                    "out": {"type": "null"},
                }
            ),
        )
    # r6 regression (found by the verify probe): the MEMORY sink used to
    # register a lazy view, so stop_on_invalid_record=true "succeeded" and
    # the FAILFAST error surfaced later, raw, when the view was first read.
    # Eager-by-default materialization classifies it like every other sink.
    with pytest.raises(RemoteTaskFailedDataError):
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {**base, "stop_on_invalid_record": True},
                    "out": {"type": "memory"},
                }
            ),
        )
    # opt-out: a lazy view defers execution (for plans too big to pin)
    rep = run_pipeline(
        spark,
        load_spec(
            {
                "in": {**base, "stop_on_invalid_record": True},
                "out": {"type": "memory", "options": {"eager": "false", "view": "lazy_out"}},
            }
        ),
    )
    assert rep.succeeded and rep.output_rows == 0  # default: nothing ran


def test_csv_sink_per_column_timestamp_output_formats(spark, tmp_path):
    """Reference csv FORMATTER column_options — per-column timestamp OUTPUT
    formats (embulk_mapred_config.yml:47-50). Two columns with DISTINCT
    formats written through the sink, then read back through the engine's
    own csv source declaring the same per-column formats: full roundtrip."""
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [
            (1, "2024-03-05 10:20:30", "2024-03-05 11:00:00"),
            (2, "2024-12-31 23:59:59", "2025-01-01 00:00:01"),
        ],
        "id long, created string, updated string",
    ).selectExpr(
        "id",
        "cast(created as timestamp) AS created",
        "cast(updated as timestamp) AS updated",
    ).coalesce(1).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")
    rep = run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": src},
                "out": {
                    "type": "csv",
                    "path": out,
                    "options": {
                        "column_options": {
                            "created": {"format": "%Y/%m/%d %H:%M:%S"},
                            "updated": {"format": "%H:%M:%S %d-%m-%Y"},
                        }
                    },
                },
            }
        ),
    )
    assert rep.succeeded and rep.output_rows == 2
    # raw file carries each column's OWN format
    import pathlib

    raw = "".join(
        p.read_text()
        for p in pathlib.Path(out).glob("part-*.csv")
    )
    assert "2024/03/05 10:20:30" in raw
    assert "11:00:00 05-03-2024" in raw
    # roundtrip through the engine's own csv source with the same formats
    rep2 = run_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "csv",
                    "path": out,
                    "columns": [
                        {"name": "id", "type": "long"},
                        {
                            "name": "created",
                            "type": "timestamp",
                            "format": "%Y/%m/%d %H:%M:%S",
                        },
                        {
                            "name": "updated",
                            "type": "timestamp",
                            "format": "%H:%M:%S %d-%m-%Y",
                        },
                    ],
                    "options": {"skip_header_lines": 1},
                },
                "out": {"type": "memory"},
            }
        ),
    )
    assert rep2.succeeded
    got = {
        r.id: (str(r.created), str(r.updated))
        for r in spark.table("pipeline_out").collect()
    }
    assert got == {
        1: ("2024-03-05 10:20:30", "2024-03-05 11:00:00"),
        2: ("2024-12-31 23:59:59", "2025-01-01 00:00:01"),
    }


# ---------------------------------------------------------------------------
# The reference's minimum-slice e2e, ported (SURVEY §7.4): 12-column schema
# (timestamp + 6 strings + 2 longs + double + boolean + json), 2 CSV input
# files with headers, CSV output, no partitioning → output multiset equals
# input multiset (TestMapReduceExecutor.testEmbulkMapper + assertFileContent,
# TEST/java/.../TestMapReduceExecutor.java:76-92,311-331).
# ---------------------------------------------------------------------------

MAPRED_CONFIG_COLUMNS = [
    {"name": "timestamp", "type": "timestamp", "format": "%Y-%m-%d %H:%M:%S"},
    {"name": "host", "type": "string"},
    {"name": "path", "type": "string"},
    {"name": "method", "type": "string"},
    {"name": "referer", "type": "string"},
    {"name": "code", "type": "long"},
    {"name": "agent", "type": "string"},
    {"name": "user", "type": "string"},
    {"name": "size", "type": "long"},
    {"name": "d", "type": "double"},
    {"name": "flag", "type": "boolean"},
    {"name": "v_json", "type": "json"},
]

_HEADER = "timestamp,host,path,method,referer,code,agent,user,size,d,flag,v_json\n"
_FILE1 = _HEADER + (
    '2014-10-02 22:15:39,10.0.0.1,/a/b,GET,/home,200,agent one,-,136,1.1,true,"{""k0"":""v0"",""k1"":""v1""}"\n'
    '2014-10-02 22:15:01,10.0.0.2,/a/c?x=1,GET,-,200,agent two,-,70,1.2,false,"[1,2,""3""]"\n'
    "2014-10-02 22:15:57,10.0.0.3,/d,POST,-,500,agent three,u1,404,1.3,true,\n"
)
_FILE2 = _HEADER + (
    '2014-10-03 01:00:00,10.0.0.4,/e,GET,/d,404,agent four,-,12,2.5,false,"{""z"":[true,null]}"\n'
    "2014-10-03 02:30:30,10.0.0.5,/f,PUT,-,201,agent five,u2,9000,0.0,true,\n"
)


def test_embulk_mapred_config_minimum_slice(spark, tmp_path):
    src = tmp_path / "csv"
    src.mkdir()
    (src / "sample1.csv").write_text(_FILE1)
    (src / "sample2.csv").write_text(_FILE2)
    out = str(tmp_path / "out")
    spec = load_spec(
        {
            "in": {
                "type": "csv",
                "path": str(src),
                "columns": MAPRED_CONFIG_COLUMNS,
                "options": {
                    "skip_header_lines": 1,
                    "delimiter": ",",
                    "quote": '"',
                    "escape": '"',
                    "charset": "UTF-8",
                },
            },
            # the reference's output formatter also pins the timestamp format
            # (embulk_mapred_config.yml:48-50: column_options timestamp
            # %Y-%m-%d %H:%M:%S)
            "out": {
                "type": "csv",
                "path": out,
                "options": {"header": True, "timestampFormat": "yyyy-MM-dd HH:mm:ss"},
            },
            "exec": {"job_name": "embulk_mapred_0001"},
        }
    )
    rep = run_pipeline(spark, spec)
    assert rep.succeeded and rep.output_rows == 5

    # the reference asserts multiset equality of records across output files,
    # sorted by first field, header-insensitive (assertFileContent) — read
    # both sides back through the engine's own csv source with the declared
    # schema so the comparison covers the full type gauntlet
    from embulk_executor_mapreduce_spark.sources.readers import read_source
    from embulk_executor_mapreduce_spark.spec import source_from

    def read_with_schema(path: str) -> list[tuple]:
        df = read_source(
            spark,
            source_from(
                {
                    "type": "csv",
                    "path": path,
                    "columns": MAPRED_CONFIG_COLUMNS,
                    "options": {"skip_header_lines": 1},
                }
            ),
        )
        names = [c["name"] for c in MAPRED_CONFIG_COLUMNS]
        return sorted(tuple(str(r[c]) for c in names) for r in df.collect())

    got = read_with_schema(out)
    want = read_with_schema(str(src))
    assert len(got) == 5 and got == want


def test_csv_skip_bad_rows_count_only_consumption(spark, tmp_path):
    """Found by an end-to-end drive, not the suite: a count()-style consumer
    of the skip-bad-rows csv frame prunes every data column, and Spark's
    native csv scan refuses a plan that references ONLY the corrupt-record
    column (QUERY_ONLY_CORRUPT_RECORD_COLUMN). The text+from_csv path has no
    such restriction. Also pins the ISO-timestamp fallback: from_csv must
    accept `1997-10-31T00:00:00` under the engine's space-separated default
    format exactly like the native reader does (enableDateTimeParsingFallback).
    """
    from embulk_executor_mapreduce_spark.sources.readers import read_source
    from embulk_executor_mapreduce_spark.spec import source_from

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.csv").write_text(
        "1,alice,1997-10-31T00:00:00.000\n"
        "BADROW\n"
        "2,bob,1997-11-01 12:30:00\n"
    )
    df = read_source(
        spark,
        source_from(
            {
                "type": "csv",
                "path": str(src),
                "columns": [
                    {"name": "id", "type": "long"},
                    {"name": "name", "type": "string"},
                    {"name": "ts", "type": "timestamp"},
                ],
                "stop_on_invalid_record": False,
            }
        ),
    )
    # count() is the column-pruned consumption that crashed the native path
    assert df.count() == 2
    rows = {r.id: (r.name, str(r.ts)) for r in df.collect()}
    assert rows == {
        1: ("alice", "1997-10-31 00:00:00"),
        2: ("bob", "1997-11-01 12:30:00"),
    }


def test_jsonl_invalid_record_policies(spark, tmp_path):
    """stop_on_invalid_record applies to JSONL exactly like CSV: true fails
    the load with a user-data error, false drops the malformed line — it must
    never silently become an all-null row (Spark's default PERMISSIVE json
    behavior), and the skip path must survive count()-only consumption."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"id": 1, "name": "alice"}\n'
        "NOT JSON AT ALL\n"
        '{"id": 2, "name": "bob"}\n'
    )
    cols = [{"name": "id", "type": "long"}, {"name": "name", "type": "string"}]
    base = {"type": "json", "path": str(src), "columns": cols}

    from embulk_executor_mapreduce_spark.sources.readers import read_source
    from embulk_executor_mapreduce_spark.spec import source_from

    df = read_source(spark, source_from(dict(base)))
    assert df.count() == 2  # count-only consumption, bad line dropped
    assert {(r.id, r.name) for r in df.collect()} == {(1, "alice"), (2, "bob")}

    with pytest.raises(RemoteTaskFailedDataError):
        run_pipeline(
            spark,
            load_spec(
                {
                    "in": {**base, "stop_on_invalid_record": True},
                    "out": {"type": "null"},
                }
            ),
        )


def test_embulk_mapred_partitioning_config_slice(spark, tmp_path):
    """The reference's PARTITIONED e2e, ported in shape
    (embulk_mapred_partitioning_config.yml + TestMapReduceExecutor
    .testEmbulkPartitioningMapper): same 12-column fixture, hour
    partitioning on the timestamp column with map_side_partition_split: 2,
    CRLF csv formatter out with the per-column timestamp format — output
    multiset equals input multiset and the sink carries one directory per
    hour bucket."""
    from pathlib import Path

    src = tmp_path / "csv"
    src.mkdir()
    (src / "sample1.csv").write_text(_FILE1)
    (src / "sample2.csv").write_text(_FILE2)
    out = str(tmp_path / "out")
    spec = load_spec(
        {
            "in": {
                "type": "csv",
                "path": str(src),
                "columns": MAPRED_CONFIG_COLUMNS,
                "options": {
                    "skip_header_lines": 1,
                    "delimiter": ",",
                    "quote": '"',
                    "escape": '"',
                    "charset": "UTF-8",
                },
            },
            "out": {
                "type": "csv",
                "path": out,
                "partition_by_bucket": True,
                "options": {
                    "header": True,
                    "newline": "CRLF",
                    "column_options": {
                        "timestamp": {"format": "%Y-%m-%d %H:%M:%S"}
                    },
                },
            },
            "exec": {
                "job_name": "embulk_mapred_partitioning_0001",
                "reducers": 2,
                "partitioning": {
                    "column": "timestamp",
                    "unit": "hour",
                    "unix_timestamp_unit": "sec",
                    "map_side_partition_split": 2,
                },
            },
        }
    )
    rep = run_pipeline(spark, spec)
    assert rep.succeeded and rep.output_rows == 5

    # fixture spans 3 distinct hours (22:15 x3, 01:00, 02:30)
    buckets = sorted(p.name for p in Path(out).glob("__bucket=*"))
    assert len(buckets) == 3

    from embulk_executor_mapreduce_spark.sources.readers import read_source
    from embulk_executor_mapreduce_spark.spec import source_from

    def read_with_schema(path: str) -> list[tuple]:
        df = read_source(
            spark,
            source_from(
                {
                    "type": "csv",
                    "path": path,
                    "columns": MAPRED_CONFIG_COLUMNS,
                    "options": {"skip_header_lines": 1},
                }
            ),
        )
        names = [c["name"] for c in MAPRED_CONFIG_COLUMNS]
        return sorted(tuple(str(r[c]) for c in names) for r in df.collect())

    got = read_with_schema(f"{out}/__bucket=*")
    want = read_with_schema(str(src))
    assert len(got) == 5 and got == want


def test_embulk_mapred_invalid_configs(spark):
    """Reference error-path parity (TestMapReduceExecutor.testInvalid*):
    a partitioning block without column/unit
    (embulk_mapred_invalid_partitioning_config.yml: `partitioning: {type:
    long}`) and reducers: -1 (embulk_mapred_invalid_reducers_config.yml)
    are CONFIG-time errors, raised before any job is submitted."""
    from embulk_executor_mapreduce_spark.errors import ConfigError, PartitionError

    base = {
        "in": {
            "type": "csv",
            "path": "unused",
            "columns": [{"name": "timestamp", "type": "timestamp"}],
        },
        "out": {"type": "null"},
    }
    with pytest.raises((ConfigError, PartitionError)):
        load_spec({**base, "exec": {"partitioning": {"unit": "hour"}}})
    with pytest.raises((ConfigError, PartitionError)):
        load_spec(
            {**base, "exec": {"partitioning": {"column": "timestamp", "unit": "week"}}}
        )
    with pytest.raises((ConfigError, PartitionError)):
        load_spec(
            {
                **base,
                "exec": {
                    "reducers": -1,
                    "partitioning": {"column": "timestamp", "unit": "hour"},
                },
            }
        )


def test_csv_roundtrip_adversarial_strings(spark, tmp_path):
    """Adversarial quoting battery through the engine's own csv sink →
    csv source: delimiters / quotes / escapes / backslashes / unicode /
    json-ish payloads / whitespace edges must survive byte-exactly.
    Embedded newlines are out of scope (line-oriented split, no multiLine —
    documented in readers.py); the empty string reads back as NULL (csv
    cannot distinguish them under the default null_string '')."""
    vals = [
        "plain",
        "comma,inside",
        'quote"inside',
        '"fully quoted"',
        "escape\\backslash",
        "both\",and',comma",
        " leading and trailing ",
        "\ttab\tseparated\t",
        "unicode: café 日本語 \U0001f600",
        '{"json":"value","n":[1,2]}',
        "trailing backslash\\",
        "=formula()",
        "semi;colon;fields",
        "two  spaces",
        "'single quoted'",
    ]
    rows = [(i, v) for i, v in enumerate(vals)]
    src_df = spark.createDataFrame(rows, "id long, s string")
    out = str(tmp_path / "csv_out")
    from embulk_executor_mapreduce_spark.sinks.writer import write_sink
    from embulk_executor_mapreduce_spark.spec import SinkSpec, source_from
    from embulk_executor_mapreduce_spark.sources.readers import read_source

    write_sink(src_df, SinkSpec(type="csv", path=out, options={}))
    back = read_source(
        spark,
        source_from(
            {
                "type": "csv",
                "path": out,
                "columns": [
                    {"name": "id", "type": "long"},
                    {"name": "s", "type": "string"},
                ],
            }
        ),
    )
    got = {r.id: r.s for r in back.collect()}
    want = dict(rows)
    assert got == want, {
        i: (got.get(i), want[i]) for i in want if got.get(i) != want[i]
    }


def test_jsonl_roundtrip_adversarial_strings(spark, tmp_path):
    """JSONL twin of the csv adversarial battery — json quoting must carry
    every hostile payload byte-exactly, including embedded newlines (legal
    inside a JSON string as \\n) and the empty string (distinguishable from
    NULL in json, unlike csv)."""
    vals = [
        "plain",
        'quote"inside',
        "escape\\backslash",
        "newline\ninside",
        "tab\tand\rcarriage",
        "unicode: café 日本語 \U0001f600",
        '{"nested":"json"}',
        "",
        " leading and trailing ",
    ]
    rows = [(i, v) for i, v in enumerate(vals)]
    src_df = spark.createDataFrame(rows, "id long, s string")
    out = str(tmp_path / "json_out")
    from embulk_executor_mapreduce_spark.sinks.writer import write_sink
    from embulk_executor_mapreduce_spark.spec import SinkSpec, source_from
    from embulk_executor_mapreduce_spark.sources.readers import read_source

    write_sink(src_df, SinkSpec(type="json", path=out, options={}))
    back = read_source(
        spark,
        source_from(
            {
                "type": "json",
                "path": out,
                "columns": [
                    {"name": "id", "type": "long"},
                    {"name": "s", "type": "string"},
                ],
            }
        ),
    )
    got = {r.id: r.s for r in back.collect()}
    assert got == dict(rows), {
        i: (got.get(i), v) for i, v in rows if got.get(i) != v
    }
