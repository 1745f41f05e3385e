"""Filter chain — the reference's ordered FilterPlugin list (SURVEY.md §2.2 O3).

Reference semantics: an ordered list of plugins applied between input and
output; each may transform records *and* schema; the executor only composes
them (``EmbulkPartitioningMapReduce.java:83,126-130``). Spark-first, each
filter type compiles to a declarative DataFrame transformation (Catalyst
optimizes across the chain — filters push down through projections for free);
the ``pandas`` filter is the escape hatch for arbitrary row-level plugins
(``mapInPandas``, Arrow-batched — the slow path, kept out of the built-in
types).

Filter configs:
- ``select``: {columns: [...]}                      — projection (+ order)
- ``drop``: {columns: [...]}
- ``rename``: {mapping: {old: new}}
- ``cast``: {mapping: {col: embulk_type}}
- ``filter``: {predicate: "sql expression"}
- ``with_column``: {name: ..., expr: "sql expression"}
- ``pandas``: {fn: registered name}                 — plugin slot
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ConfigError
from ..spec import FilterSpec
from ..types import EMBULK_TO_SPARK

PandasFilterFn = Callable[[pd.DataFrame], pd.DataFrame]
_FILTER_REGISTRY: dict[str, tuple[PandasFilterFn, str]] = {}


def register_pandas_filter(name: str, fn: PandasFilterFn, out_schema: str) -> None:
    """Register a row-level plugin filter: pandas DataFrame in → out, with the
    (possibly changed) output schema as a DDL string — filters may change
    schema, like reference FilterPlugins."""
    _FILTER_REGISTRY[name] = (fn, out_schema)


def apply_filter(df: DataFrame, spec: FilterSpec) -> DataFrame:
    cfg = spec.config
    if spec.type == "select":
        return df.select(*cfg["columns"])
    if spec.type == "drop":
        return df.drop(*cfg["columns"])
    if spec.type == "rename":
        for old, new in cfg["mapping"].items():
            df = df.withColumnRenamed(old, new)
        return df
    if spec.type == "cast":
        for col, etype in cfg["mapping"].items():
            if etype not in EMBULK_TO_SPARK:
                raise ConfigError(f"cast filter: unknown type {etype!r}")
            df = df.withColumn(col, F.col(col).cast(EMBULK_TO_SPARK[etype]))
        return df
    if spec.type == "filter":
        return df.filter(cfg["predicate"])
    if spec.type == "with_column":
        return df.withColumn(cfg["name"], F.expr(cfg["expr"]))
    if spec.type == "pandas":
        name = cfg.get("fn")
        if name not in _FILTER_REGISTRY:
            raise ConfigError(f"pandas filter {name!r} is not registered")
        fn, out_schema = _FILTER_REGISTRY[name]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield fn(pdf)

        return df.mapInPandas(run, schema=out_schema)
    raise ConfigError(f"unknown filter type {spec.type!r}")


def apply_filter_chain(df: DataFrame, filters) -> DataFrame:
    for f in filters:
        df = apply_filter(df, f)
    return df
