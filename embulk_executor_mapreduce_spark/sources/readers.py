"""Source readers.

The reference's source model (SURVEY.md §2.2 O1/O2): N independent input tasks,
schema declared in config, CSV parse options (charset/delimiter/quote/escape/
skip_header_lines/per-column timestamp format), and an invalid-record policy —
``stop_on_invalid_record: true`` fails the load with a *user-data* error,
``false`` skips bad records.

Spark-first: file sources go through ``spark.read`` so Catalyst sees the scan
(predicate pushdown, column pruning, partition pruning at scale); one Spark
input partition plays the role of one reference input task. The invalid-record
policy maps to FAILFAST vs PERMISSIVE+corrupt-record-drop
(reference test ``TestMapReduceExecutor.java:177-192``).

Plugin-style (non-file) sources — reference ``EmbulkInputSplit``/
``EmbulkRecordReader`` running an arbitrary InputPlugin per task index — map to
``spark.range(task_count)`` + ``mapInPandas`` driving a user task function, so
custom readers still parallelize across the cluster (SURVEY.md §7.5 risk 5).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import ConfigError
from ..spec import SourceSpec
from ..types import build_schema

_CORRUPT = "__corrupt_record"


def _read_csv(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    schema = build_schema(list(spec.columns))
    opts: dict[str, Any] = {
        "header": False,
        "sep": ",",
        "quote": '"',
        "escape": '"',
        "encoding": "UTF-8",
        "nullValue": "",
        "timestampFormat": "yyyy-MM-dd HH:mm:ss[.SSSSSS]",
    }
    # reference csv parser options → spark csv options
    ref_map = {
        "delimiter": "sep",
        "charset": "encoding",
        "quote": "quote",
        "escape": "escape",
        "newline": "lineSep",
        "null_string": "nullValue",
    }
    options = dict(spec.options)
    skip_header = int(options.pop("skip_header_lines", 0))
    if skip_header == 1:
        opts["header"] = True
    elif skip_header > 1:
        raise ConfigError("skip_header_lines > 1 is not supported by the csv source")
    for ref_key, spark_key in ref_map.items():
        if ref_key in options:
            opts[spark_key] = options.pop(ref_key)
    # per-column timestamp format: Spark csv has one global timestampFormat;
    # take the first declared column format (reference allows per-column but
    # its own test fixture uses a single format, embulk_mapred_config.yml:26).
    for c in spec.columns:
        if c.type == "timestamp" and c.format:
            opts["timestampFormat"] = _strptime_to_java(c.format)
            break
    opts.update(options)

    if spec.stop_on_invalid_record:
        opts["mode"] = "FAILFAST"
        return spark.read.options(**opts).schema(schema).csv(spec.path)
    # PERMISSIVE + corrupt-record column, then drop bad rows (skip semantics)
    opts["mode"] = "PERMISSIVE"
    opts["columnNameOfCorruptRecord"] = _CORRUPT
    schema_with = T.StructType(
        schema.fields + [T.StructField(_CORRUPT, T.StringType(), True)]
    )
    df = spark.read.options(**opts).schema(schema_with).csv(spec.path)
    return df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)


def _strptime_to_java(fmt: str) -> str:
    """Ruby/strptime-style format (reference config) → Java DateTimeFormatter."""
    table = {
        "%Y": "yyyy",
        "%m": "MM",
        "%d": "dd",
        "%H": "HH",
        "%M": "mm",
        "%S": "ss",
        "%N": "SSSSSSSSS",
        "%6N": "SSSSSS",
        "%3N": "SSS",
        "%z": "XX",
        "%Z": "zz",
        "%%": "%",
    }
    out = fmt
    for k, v in table.items():
        out = out.replace(k, v)
    return out


TaskFn = Callable[[int], Iterator[pd.DataFrame]]
_TASK_REGISTRY: dict[str, TaskFn] = {}


def register_task_source(name: str, fn: TaskFn) -> None:
    """Register a plugin-style reader: ``fn(task_index)`` yields pandas
    DataFrames matching the declared schema (the InputPlugin.run analog)."""
    _TASK_REGISTRY[name] = fn


def _read_task(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    if not spec.task_count or spec.task_count <= 0:
        raise ConfigError("task source requires task_count > 0")
    fn_name = spec.options.get("task_fn")
    if fn_name not in _TASK_REGISTRY:
        raise ConfigError(f"task source fn {fn_name!r} is not registered")
    fn = _TASK_REGISTRY[fn_name]
    schema = build_schema(list(spec.columns))

    # one Spark partition per input task == one reference input split
    # (EmbulkInputFormat.java:21-27: 1 split per task index)
    tasks = spark.range(spec.task_count).repartition(spec.task_count, "id")

    def run_tasks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for task_index in pdf["id"]:
                yield from fn(int(task_index))

    return tasks.mapInPandas(run_tasks, schema=schema)


def read_source(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    if spec.type == "csv":
        return _read_csv(spark, spec)
    if spec.type == "task":
        return _read_task(spark, spec)
    if spec.type in ("parquet", "orc", "json"):
        if spec.type == "parquet":
            # tolerate TIMESTAMP(NANOS) parquet files (read as long nanos)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        reader = spark.read.options(**spec.options)
        if spec.columns:
            reader = reader.schema(build_schema(list(spec.columns)))
        return getattr(reader, spec.type)(spec.path)
    raise ConfigError(f"unknown source type {spec.type!r}")
