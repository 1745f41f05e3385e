"""LTSV and regex line parsers — embulk parser-plugin analogs.

The reference's parse stage is pluggable (``CsvParserPlugin`` is the one it
ships — SURVEY.md §2.2 O2; the plugin SPI slot is
``MAIN/EmbulkMapReduce.java``'s task-side plugin loading); LTSV
(Labeled Tab-Separated Values, ltsv.org) and capture-group regex parsers are
the two most common parser plugins in the public embulk ecosystem
(embulk-parser-ltsv, embulk-parser-regex). Re-expressed Spark-first: both are
pure Catalyst expression chains over the engine's text source —
``regexp_extract`` / ``regexp_like`` / ``try_cast`` are JVM expressions, so
the parse runs inside WholeStageCodegen with no Python in the hot path, and a
100 TB load is one narrow scan (no shuffle, no UDF serialization boundary).

Both parsers carry the engine's full invalid-record policy surface, identical
to the csv path (``sources/readers.py``):

- ``stop_on_invalid_record: true``  → first bad line raises, classified
  *user-data* (``raise_error`` → USER_RAISED_EXCEPTION; bad typed values →
  ANSI CAST_INVALID_INPUT / CANNOT_PARSE_TIMESTAMP);
- ``false``                          → bad lines (structural) and records with
  unparseable typed values are dropped — record-level skip, mirroring csv
  PERMISSIVE where ANY failed field corrupt-flags the whole row;
- ``invalid_record_path``           → the split twins below quarantine the
  skipped lines as the same auditable ``(input_file, raw_record,
  partial_parse)`` JSON layout as ``read_csv_split``.

Streaming: the parse chain is expression-only, so both types compose with
``readStream.text`` unchanged (plans/compiler.run_pipeline_streaming reuses
``parsed_lines`` on the stream frame; the quarantine split stays batch-only,
like csv/json).

Null convention: an absent LTSV label is NULL; a present-but-empty value
(``label:``) or a regex group matching the empty string equals the source's
``null_string`` option (default ``""`` — the csv reader's nullValue default)
and reads as NULL. Duplicate LTSV labels resolve first-occurrence-wins
(deterministic; a ``str_to_map`` parse would instead throw under Spark's
default EXCEPTION map-key policy — per-label anchored extraction sidesteps
a session-wide dedup-policy change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..errors import ConfigError
from ..spec import SourceSpec
from .readers import NEWLINE_LITERALS, _strptime_to_java

#: default parse format for undeclared-format timestamp columns — the same
#: default the csv source uses (_csv_options), so an engine ltsv SINK's
#: output (microsecond `yyyy-MM-dd HH:mm:ss.SSSSSS`) reads back losslessly.
_DEFAULT_TS_FMT = "yyyy-MM-dd HH:mm:ss[.SSSSSS]"


def _text_options(spec: SourceSpec) -> dict[str, str]:
    """Text-reader options shared by both parsers: charset + symbolic
    newline (the reference parser's option names), everything else passed
    through. Parser-level options are popped before they reach the reader."""
    opts = dict(spec.options)
    for parser_key in ("pattern", "null_string"):
        opts.pop(parser_key, None)
    if "charset" in opts:
        opts["encoding"] = opts.pop("charset")
    if "newline" in opts:
        lit = NEWLINE_LITERALS.get(str(opts["newline"]).upper(), opts["newline"])
        opts.pop("newline")
        if lit not in ("\n", "\r\n"):  # auto-detected defaults need no option
            opts["lineSep"] = lit
    return {str(k): str(v) for k, v in opts.items()}


_RESERVED = ("__file", "__line", "__invalid")


def _rx_literal(s: str) -> str:
    r"""Java-regex literal quoting that survives a literal ``\E`` inside the
    label: plain ``\Q{s}\E`` lets an embedded ``\E`` terminate the quote and
    the remainder of the name leaks into the pattern as raw regex (r12
    advisor finding). The ``Pattern.quote`` idiom splits around each ``\E``
    and re-opens the quote: ``a\Eb`` → ``\Qa\E\\E\Qb\E``."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _check_reserved(spec: SourceSpec) -> None:
    """The raw line rides under a reserved name so a DECLARED column named
    "value" (the text reader's own line column) can't collide with it.
    Called from the shared string-extraction builders, so batch, split AND
    streaming paths all hit the same plan-time ConfigError (r12 review
    finding: the streaming branch bypassed a batch-reader-only check)."""
    for c in spec.columns:
        if c.name in _RESERVED:
            raise ConfigError(
                f"column name {c.name!r} is reserved by the line parsers"
            )


def _lines(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    return spark.read.options(**_text_options(spec)).text(spec.path).select(
        F.col("_metadata.file_path").alias("__file"),
        F.col("value").alias("__line"),
    )


def _null_string(spec: SourceSpec) -> str:
    return str(spec.options.get("null_string", ""))


def _column_policy(c, ns: str, stop: bool):
    """ONE implementation of the per-column typed-conversion + failure rule,
    shared by the clean path and the quarantine complement so the two can
    never drift apart (r12 review finding: drift here silently breaks the
    invariant quarantined_rows + clean_rows == input_rows).

    Returns ``(typed_expr, fail_cond)``; ``fail_cond`` is the record-level
    skip condition (present value the type cannot parse), None for plain
    strings (nothing can fail)."""
    val = F.nullif(F.col(c.name), F.lit(ns))
    if c.type == "timestamp":
        fmt = _strptime_to_java(c.format) if c.format else _DEFAULT_TS_FMT
        typed = (
            F.to_timestamp(val, fmt) if stop else F.try_to_timestamp(val, F.lit(fmt))
        )
    elif c.spark_type().simpleString() == "string":
        return val, None
    else:
        t = c.spark_type().simpleString()
        typed = val.cast(t) if stop else val.try_cast(t)
    if stop:
        return typed, None  # typed failures raise through the ANSI forms
    return typed, val.isNotNull() & typed.isNull()


def _typed_columns(
    raw: DataFrame, spec: SourceSpec, *, keep: tuple[str, ...] = ()
) -> DataFrame:
    """String-extracted columns → declared types under the invalid-record
    policy. ``raw`` carries one string column per declared column plus
    ``__invalid`` (structural parse failure) and anything in ``keep``.

    stop=true: structural failure raises in-plan (``raise_error`` →
    USER_RAISED_EXCEPTION, user-data); typed failures raise through ANSI
    cast / to_timestamp. stop=false: the record is dropped when the line is
    structurally invalid OR any declared column has a present value its type
    cannot parse (record-level skip, csv-PERMISSIVE parity)."""
    stop = spec.stop_on_invalid_record
    ns = _null_string(spec)
    typed_exprs = []
    drop_conds = [F.col("__invalid")]
    for c in spec.columns:
        typed, fail = _column_policy(c, ns, stop)
        if fail is not None:
            drop_conds.append(fail)
        typed_exprs.append(typed.alias(c.name))

    if stop:
        # structural failures surface as a user-data raise with the offending
        # line in the message (typed failures raise from the ANSI casts)
        gate = F.when(
            F.col("__invalid"),
            F.raise_error(
                F.concat(F.lit("invalid record: "), F.col("__line"))
            ).cast("boolean"),
        ).otherwise(F.lit(True))
        return raw.filter(gate).select(*keep, *typed_exprs)
    bad = drop_conds[0]
    for c in drop_conds[1:]:
        bad = bad | c
    return raw.filter(~bad).select(*keep, *typed_exprs)


def _skipped_lines(raw: DataFrame, spec: SourceSpec) -> DataFrame:
    """The complement of :func:`_typed_columns` under skip semantics, shaped
    as the shared quarantine layout ``(input_file, raw_record,
    partial_parse)`` (same audit-table schema as ``read_csv_split``). Built
    from the SAME :func:`_column_policy` rules as the clean path."""
    ns = _null_string(spec)
    conds = [F.col("__invalid")]
    partial = []
    for c in spec.columns:
        typed, fail = _column_policy(c, ns, stop=False)
        if fail is not None:
            conds.append(fail)
        partial.append(typed.alias(c.name))
    bad = conds[0]
    for c in conds[1:]:
        bad = bad | c
    return raw.filter(bad).select(
        F.col("__file").alias("input_file"),
        F.col("__line").alias("raw_record"),
        F.to_json(F.struct(*partial)).alias("partial_parse"),
    )


# ---------------------------------------------------------------------------
# LTSV
# ---------------------------------------------------------------------------


def _ltsv_strings(lines: DataFrame, spec: SourceSpec) -> DataFrame:
    """Per-label anchored extraction: ``(?:^|\\t)\\Qlabel\\E:([^\\t]*)`` —
    value is everything up to the next tab (LTSV forbids tabs in values), the
    first colon is the label separator so colons inside values survive
    (timestamps, URLs, json props). ``\\Q..\\E`` literal-quotes the label, so
    any declared column name is safe in the pattern. Absent label → NULL
    (presence probed with regexp_like before extracting — regexp_extract
    alone returns '' for both no-match and empty value).

    Structural invalidity: any non-empty tab-separated segment without a
    colon (a field that is not ``label:value``). Fully BLANK lines are
    skipped silently under every policy — Spark's csv reader does the same,
    and hand-edited/concatenated files routinely carry them (r12 review
    finding: a blank line used to fabricate an all-NULL row)."""
    if not spec.columns:
        raise ConfigError("ltsv source requires declared columns")
    _check_reserved(spec)
    lines = lines.filter(F.length(F.col("__line")) > 0)
    invalid = F.exists(
        F.split(F.col("__line"), "\t"),
        lambda s: (F.length(s) > 0) & ~s.contains(":"),
    )
    extracted = [
        F.when(
            F.regexp_like(
                F.col("__line"), F.lit(f"(?:^|\\t){_rx_literal(c.name)}:")
            ),
            F.regexp_extract(
                F.col("__line"), f"(?:^|\\t){_rx_literal(c.name)}:([^\\t]*)", 1
            ),
        ).alias(c.name)
        for c in spec.columns
    ]
    return lines.select("__file", "__line", invalid.alias("__invalid"), *extracted)


def parsed_ltsv_lines(lines: DataFrame, spec: SourceSpec) -> DataFrame:
    """Parse a ``value``-column line frame (batch OR stream) to typed rows
    under the spec's invalid-record policy. The streaming front door calls
    this on ``readStream.text`` output — the chain is expression-only."""
    if "__line" not in lines.columns:
        lines = lines.withColumnRenamed("value", "__line")
    if "__file" not in lines.columns:
        lines = lines.select(F.lit("").alias("__file"), "__line")
    return _typed_columns(_ltsv_strings(lines, spec), spec)


def read_ltsv(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    return parsed_ltsv_lines(_lines(spark, spec), spec)


def read_ltsv_split(
    spark: SparkSession, spec: SourceSpec
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) — the LTSV twin of ``read_csv_split``. Both frames
    derive from one lazily-planned read; two scans are paid only when a
    quarantine path is configured (same trade as csv/json)."""
    raw = _ltsv_strings(_lines(spark, spec), spec)
    return _typed_columns(raw, spec), _skipped_lines(raw, spec)


# ---------------------------------------------------------------------------
# regex
# ---------------------------------------------------------------------------


def _regex_pattern(spec: SourceSpec) -> str:
    pattern = spec.options.get("pattern")
    if not pattern:
        raise ConfigError(
            "regex source requires options.pattern (one capture group per "
            "declared column, in declaration order)"
        )
    if not spec.columns:
        raise ConfigError("regex source requires declared columns")
    # plan-time group-count check via Python's re where the dialects agree;
    # a pattern Python cannot compile (Java-only syntax, e.g. possessive
    # quantifiers) skips the check and lets Spark's regex raise at run time
    try:
        import re

        n_groups = re.compile(str(pattern)).groups
    except re.error:
        return str(pattern)
    if n_groups < len(spec.columns):
        raise ConfigError(
            f"regex pattern has {n_groups} capture group(s) but the schema "
            f"declares {len(spec.columns)} column(s); add a group per column "
            "in declaration order"
        )
    return str(pattern)


def _regex_strings(lines: DataFrame, spec: SourceSpec) -> DataFrame:
    """One ``regexp_extract`` per declared column (group i+1), gated on a
    whole-line ``regexp_like`` — a non-matching line is structurally invalid
    (extract alone can't distinguish no-match from an empty group). Fully
    BLANK lines are skipped silently under every policy (csv-reader parity,
    same rule as the ltsv side)."""
    pattern = _regex_pattern(spec)
    _check_reserved(spec)
    lines = lines.filter(F.length(F.col("__line")) > 0)
    matches = F.regexp_like(F.col("__line"), F.lit(pattern))
    extracted = [
        F.when(
            matches, F.regexp_extract(F.col("__line"), pattern, i + 1)
        ).alias(c.name)
        for i, c in enumerate(spec.columns)
    ]
    return lines.select(
        "__file", "__line", (~matches).alias("__invalid"), *extracted
    )


def parsed_regex_lines(lines: DataFrame, spec: SourceSpec) -> DataFrame:
    """Stream/batch-shared parse chain (see :func:`parsed_ltsv_lines`)."""
    if "__line" not in lines.columns:
        lines = lines.withColumnRenamed("value", "__line")
    if "__file" not in lines.columns:
        lines = lines.select(F.lit("").alias("__file"), "__line")
    return _typed_columns(_regex_strings(lines, spec), spec)


def read_regex(spark: SparkSession, spec: SourceSpec) -> DataFrame:
    return parsed_regex_lines(_lines(spark, spec), spec)


def read_regex_split(
    spark: SparkSession, spec: SourceSpec
) -> tuple[DataFrame, DataFrame]:
    raw = _regex_strings(_lines(spark, spec), spec)
    return _typed_columns(raw, spec), _skipped_lines(raw, spec)
