"""Schema guessing — the engine analog of ``embulk guess``.

The reference ecosystem's signature UX is ``embulk guess``: point it at raw
files and it infers the ``columns:`` block users would otherwise hand-write
(embulk's guess plugins sample the input and vote on types). Re-expressed
Spark-first: ONE aggregate pass over a bounded sample computes, per column,
the count of non-null values each candidate type can parse — all JVM-side
``try_cast`` / ``try_to_timestamp`` expressions fused into a single
map-side-combinable aggregate — and the most specific type that parses
every non-null value wins.

Deterministic inference rules (precedence: boolean > long > double >
timestamp > date > string):

- **boolean**: every non-null value is ``true``/``false`` (case-insensitive)
- **long**:    every non-null value ``try_cast``s to BIGINT
- **double**:  every non-null value ``try_cast``s to DOUBLE
- **timestamp**: every non-null value parses with the engine's default
  format ``yyyy-MM-dd HH:mm:ss[.SSSSSS]`` (the csv/ltsv sources' default —
  a guessed schema round-trips through the same parsers)
- **date**:    every non-null value parses as ``yyyy-MM-dd``
- **string**:  the fallback; also the answer for all-null/empty columns
  (no evidence → the widest type, embulk's behavior)

Scale shape: guessing reads a SAMPLE (``limit sample_rows`` — one narrow
scan task at any corpus size), then one aggregate over sample × columns
candidate counts. The output is a ``columns:`` list the spec layer accepts
verbatim, so ``options: {guess: true}`` on a csv/ltsv source resolves the
schema at plan time and compiles exactly like a hand-declared one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..errors import ConfigError
from ..types import ColumnSpec

#: must match the csv/ltsv sources' default parse format so a guessed
#: timestamp column round-trips through the same reader
_TS_FMT = "yyyy-MM-dd HH:mm:ss[.SSSSSS]"
_DATE_FMT = "yyyy-MM-dd"


def guess_types(sample: DataFrame) -> list[ColumnSpec]:
    """Infer an embulk-style type per (string-typed) column of ``sample``.

    One fused aggregate: for every column, ``count(value)`` plus one
    conditional count per candidate type; a candidate wins when it parses
    every non-null value, most-specific first."""
    aggs = []
    for name in sample.columns:
        v = F.nullif(F.col(name).cast("string"), F.lit(""))
        checks = {
            "n": v.isNotNull(),
            "boolean": F.lower(v).isin("true", "false"),
            "long": F.expr(f"try_cast(nullif(cast(`{name}` as string), '') as bigint)").isNotNull(),
            "double": F.expr(f"try_cast(nullif(cast(`{name}` as string), '') as double)").isNotNull(),
            "timestamp": F.try_to_timestamp(v, F.lit(_TS_FMT)).isNotNull(),
            "date": F.to_date(
                F.when(v.rlike(r"^\d{4}-\d{2}-\d{2}$"), v), _DATE_FMT
            ).isNotNull(),
        }
        for kind, cond in checks.items():
            aggs.append(
                F.sum(F.when(cond, 1).otherwise(0)).alias(f"{name} {kind}")
            )
    row = sample.agg(*aggs).collect()[0].asDict()
    out: list[ColumnSpec] = []
    for name in sample.columns:
        n = row[f"{name} n"]
        kind = "string"
        if n:  # all-null column → string (no evidence)
            for candidate in ("boolean", "long", "double", "timestamp", "date"):
                if row[f"{name} {candidate}"] == n:
                    kind = candidate
                    break
        out.append(ColumnSpec(name=name, type=kind))
    return out


def guess_csv_schema(
    spark: SparkSession,
    path: str,
    options: dict | None = None,
    sample_rows: int = 1000,
) -> list[ColumnSpec]:
    """``embulk guess`` for csv: sample the file(s), infer column names
    (header row, else ``c0..cN``) and types. The result plugs into a csv
    source block verbatim."""
    opts = dict(options or {})
    header = str(opts.pop("header", opts.pop("skip_header_lines", 0))) in (
        "True",
        "true",
        "1",
    )
    sep = str(opts.pop("delimiter", opts.pop("sep", ",")))
    reader_opts = {
        "header": str(header).lower(),
        "sep": sep,
        "inferSchema": "false",  # all-string read; OUR rules decide types
        **{str(k): str(v) for k, v in opts.items()},
    }
    sample = spark.read.options(**reader_opts).csv(path).limit(sample_rows)
    if not header:
        sample = sample.toDF(*[f"c{i}" for i in range(len(sample.columns))])
    if not sample.columns:
        raise ConfigError(f"cannot guess a schema from empty input {path!r}")
    return guess_types(sample)


def guess_ltsv_schema(
    spark: SparkSession,
    path: str,
    options: dict | None = None,
    sample_rows: int = 1000,
) -> list[ColumnSpec]:
    """``embulk guess`` for LTSV: labels come from the data (first-seen
    order across the sample, alphabetical within a line's novel labels is
    NOT assumed — order is by first appearance for stable diffs), types
    from the same rules."""
    from .lineparsers import _text_options
    from ..spec import SourceSpec

    spec = SourceSpec(type="ltsv", path=path, options=dict(options or {}))
    lines = (
        spark.read.options(**_text_options(spec))
        .text(path)
        .limit(sample_rows)
        .select(F.col("value").alias("__line"))
        .filter(F.length("__line") > 0)
    )
    # label discovery: explode tab segments, take the pre-first-colon label;
    # first-appearance order via (min file-order surrogate) — monotonically
    # increasing ids are fine for a bounded sample
    labeled = lines.select(
        F.monotonically_increasing_id().alias("ord"),
        F.explode(F.split(F.col("__line"), "\t")).alias("seg"),
    ).filter(F.col("seg").contains(":"))
    labels = [
        r["label"]
        for r in labeled.select(
            F.substring_index(F.col("seg"), ":", 1).alias("label"), "ord"
        )
        .groupBy("label")
        .agg(F.min("ord").alias("first_seen"))
        .orderBy("first_seen", "label")
        .collect()
    ]
    if not labels:
        raise ConfigError(f"cannot guess a schema from empty input {path!r}")
    extracted = lines.select(
        *[
            F.regexp_extract(
                F.col("__line"), f"(?:^|\\t)\\Q{lab}\\E:([^\\t]*)", 1
            ).alias(lab)
            for lab in labels
        ]
    )
    return guess_types(extracted)
