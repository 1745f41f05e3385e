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

Relational stages (extension surface — the spec carries full analytic
pipelines):
- ``join``: {source: {in-block}, on: [cols] | condition: "expr",
  how: inner|left|..., broadcast: bool (default true — lookups are small;
  set false for big-big joins so Catalyst/AQE picks the shuffle strategy)}
- ``aggregate``: {group_by: [...], aggs: {alias: "sql agg expr"}}
- ``dedup``: {columns: [...], order_by: [...] (optional — deterministic
  survivor via row_number; without it, dropDuplicates keeps an arbitrary row)}
- ``sort``: {by: ["col", "col desc", ...]}
- ``limit``: {n: int}
- ``sql``: {query: "... FROM __input ..."}          — full SQL escape hatch
- ``pagerank``: {src: col, dst: col, iters: int (default 5),
  redistribute_dangling: bool, edges_distinct: bool} — treats the incoming
  frame as an edge list and replaces it with (node, rank) integer
  centrality scores (operators/graph.py); follow with a ``join`` stage to
  weight documents by the rank of their source node (crawl-quality
  weighting). Batch-only: the fixed-iteration loop is eager.
  ``edges_distinct: true`` is the production-form selector (SCALING.md §3
  decision rule): the caller declares the input ALREADY deduplicated —
  e.g. an ``in: {type: table}`` source over a ``bucketBy(src)`` standing
  graph — so the stage skips the distinct+repartition+persist and every
  iteration reads the storage layout with zero edge-side exchanges.
  Declaring it on a frame with duplicate edges double-counts their
  contributions; leave false unless the upstream layout guarantees it.
- ``url_canonicalize``: {column: url col (default "url")} — appends
  ``canon_url``, ``host``, ``registrable_domain`` (operators/web.py: pure
  JVM regexp/array expressions, map-only, streamable); chain with ``dedup``
  on canon_url and per-domain capping for the web-corpus front door.
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
    if spec.type == "join":
        from ..sources.readers import read_source
        from ..spec import source_from

        if "source" not in cfg:
            raise ConfigError("join filter requires a 'source' block")
        right = read_source(df.sparkSession, source_from(cfg["source"]))
        if cfg.get("broadcast", True):
            right = F.broadcast(right)
        how = cfg.get("how", "inner")
        if "on" in cfg:
            return df.join(right, on=list(cfg["on"]), how=how)
        if "condition" in cfg:
            return df.join(right, on=F.expr(cfg["condition"]), how=how)
        raise ConfigError("join filter requires 'on' columns or a 'condition'")
    if spec.type == "aggregate":
        aggs = cfg.get("aggs")
        if not aggs:
            raise ConfigError("aggregate filter requires an 'aggs' mapping")
        exprs = [F.expr(e).alias(a) for a, e in aggs.items()]
        keys = cfg.get("group_by", [])
        return df.groupBy(*keys).agg(*exprs) if keys else df.agg(*exprs)
    if spec.type == "dedup":
        cols = cfg.get("columns")
        if not cols:
            raise ConfigError("dedup filter requires 'columns'")
        order_by = cfg.get("order_by")
        if not order_by:
            return df.dropDuplicates(list(cols))
        from pyspark.sql import Window as W

        w = W.partitionBy(*cols).orderBy(*[_sort_col(s) for s in order_by])
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    if spec.type == "sort":
        return df.orderBy(*[_sort_col(s) for s in cfg.get("by", [])])
    if spec.type == "limit":
        return df.limit(int(cfg["n"]))
    if spec.type == "sql":
        query = cfg.get("query", "")
        if "__input" not in query:
            raise ConfigError("sql filter query must reference __input")
        df.createOrReplaceTempView("__input")
        return df.sparkSession.sql(query)
    if spec.type == "url_canonicalize":
        from .web import url_canonicalize

        url_col = cfg.get("column", "url")
        if url_col not in df.columns:
            # reference findColumnByName config-time error
            # (TimestampPartitioning.java:152-161)
            raise ConfigError(
                f"url_canonicalize filter column {url_col!r} missing from the data"
            )
        return url_canonicalize(df, url_col=url_col)
    if spec.type == "pagerank":
        from .graph import pagerank

        src, dst = cfg.get("src"), cfg.get("dst")
        if not src or not dst:
            raise ConfigError("pagerank filter requires 'src' and 'dst' columns")
        for c in (src, dst):
            if c not in df.columns:
                # reference findColumnByName config-time error
                # (TimestampPartitioning.java:152-161)
                raise ConfigError(
                    f"pagerank filter column {c!r} missing from the data"
                )
        iters = int(cfg.get("iters", 5))
        if iters < 1:
            raise ConfigError(f"pagerank iters must be >= 1, got {iters}")
        return pagerank(
            df,
            src_col=src,
            dst_col=dst,
            iters=iters,
            redistribute_dangling=bool(cfg.get("redistribute_dangling", False)),
            edges_distinct=bool(cfg.get("edges_distinct", False)),
        )
    raise ConfigError(f"unknown filter type {spec.type!r}")


def _sort_col(s: str):
    parts = s.split()
    if len(parts) == 2 and parts[1].lower() == "desc":
        return F.col(parts[0]).desc()
    if len(parts) == 2 and parts[1].lower() == "asc":
        return F.col(parts[0]).asc()
    if len(parts) == 1:
        return F.col(s)
    raise ConfigError(f"bad sort spec {s!r} (want 'col' or 'col desc')")


def apply_filter_chain(df: DataFrame, filters) -> DataFrame:
    for f in filters:
        df = apply_filter(df, f)
    return df
