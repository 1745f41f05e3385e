"""Type system mapping: the reference's six scalar types → Spark types.

The reference moves exactly six types through its pipeline (SURVEY.md §1.3, the
six ``ColumnVisitor`` branches in ``BufferedPagePartitioner.java:38-91``):
boolean, long, double, string, timestamp, json. All nullable. Schemas are
declared in config, never inferred (``embulk_mapred_config.yml:25-37``).

``json`` is heterogeneous (object vs array in one column) so it maps to a
StringType carrying canonical JSON text, queried on demand with
``get_json_object`` / ``from_json`` (SURVEY.md §7.5 risk 2). ``timestamp``
maps to Spark's microsecond TimestampType; the reference's nanosecond
component is below bucket granularity (seconds) so partitioning semantics are
unaffected.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from .errors import ConfigError

EMBULK_TO_SPARK: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "timestamp": T.TimestampType(),
    "json": T.StringType(),  # canonical JSON text
    # engine extensions beyond the reference's six (SURVEY.md §2.4):
    "int": T.IntegerType(),
    "float": T.FloatType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
    "array<float>": T.ArrayType(T.FloatType()),
    "array<double>": T.ArrayType(T.DoubleType()),
    "array<string>": T.ArrayType(T.StringType()),
}


@dataclass(frozen=True)
class ColumnSpec:
    """One declared column: name + embulk-style type + optional parse format
    (per-column timestamp format, reference ``embulk_mapred_config.yml:26``)."""

    name: str
    type: str
    format: str | None = None

    def spark_type(self) -> T.DataType:
        try:
            return EMBULK_TO_SPARK[self.type]
        except KeyError:
            raise ConfigError(
                f"unknown column type {self.type!r} for column {self.name!r}; "
                f"expected one of {sorted(EMBULK_TO_SPARK)}"
            ) from None


def build_schema(columns: list[ColumnSpec]) -> T.StructType:
    """Ordered, explicit, all-nullable — like the reference's ``Schema``
    (SURVEY.md §1.2)."""
    if not columns:
        raise ConfigError("schema must declare at least one column")
    names = [c.name for c in columns]
    if len(set(names)) != len(names):
        raise ConfigError(f"duplicate column names in schema: {names}")
    return T.StructType(
        [T.StructField(c.name, c.spark_type(), nullable=True) for c in columns]
    )
