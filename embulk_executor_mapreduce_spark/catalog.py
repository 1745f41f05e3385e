"""Query catalog: every implemented operator exposed as a named query with a
DuckDB oracle.

This is the engine's correctness-gate surface (driver contract in
``/root/repo/__spark_entry__.py``): each entry pairs a Spark implementation
``fn(spark, sf_dir) -> DataFrame`` with the equivalent ANSI SQL DuckDB runs on
the same parquet tables. Column names and types are aligned on both sides
(the driver hash-compares values after sorting columns by name).

Float discipline: any aggregate of doubles is rounded to 2 decimals on BOTH
sides so summation-order differences between engines can't flip the value
hash; LIMIT/top-k queries order by raw stored values (bit-identical in both
engines) with an integer tie-break, never by a freshly computed float sum.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    tags: tuple[str, ...] = ()


REGISTRY: dict[str, CatalogEntry] = {}


def register(name: str, oracle: str | None, tags: tuple[str, ...] = ()):
    def deco(fn):
        REGISTRY[name] = CatalogEntry(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


#: scratch dirs for state-building queries: the TemporaryDirectory objects
#: are kept alive here so each invocation's artifacts are removed at
#: interpreter exit instead of accumulating in /tmp across sweep/seal
#: cycles (VERDICT r10). Every call still gets a FRESH dir — the rows'
#: determinism comes from their batch constructions, never from reuse.
_SCRATCH_DIRS: list = []


def scratch_dir(prefix: str) -> str:
    import tempfile

    td = tempfile.TemporaryDirectory(prefix=prefix, ignore_cleanup_errors=True)
    _SCRATCH_DIRS.append(td)
    return td.name


# The driver's testdata generator has shipped timestamps under three physical
# parquet encodings across rounds: TIMESTAMP(NANOS) (Spark reads as long via
# the nanosAsLong legacy conf), TIMESTAMP(MICROS) isAdjustedToUTC=false
# (loads as TIMESTAMP_NTZ), and TIMESTAMP(MICROS) isAdjustedToUTC=true
# (loads as TIMESTAMP). Every catalog query wants plain TimestampType, so
# load() normalizes all three — exactly, no double round-trips:
#   nanos-long  → timestamp_micros(ts div 1000)   (integer division)
#   TIMESTAMP_NTZ → cast to TIMESTAMP            (session tz is pinned UTC,
#     so the wall-clock reading is the same instant DuckDB sees for the same
#     naive value — both sides of the oracle stay in lockstep)
# The nanos case is detected from the parquet FOOTER per table (metadata
# only, no data read) rather than a hardcoded {table: columns} map: the
# flips have historically hit events.ts, but an r10 canary sweep proved a
# nanos-encoded o_orderdate would break 5 queries (raw bigint leaking
# through year()/date comparisons) — footer probing makes EVERY table's
# timestamp columns flip-proof, and is a no-op under the micros encodings.
# The ns→µs step is FLOOR division in integer math — `x div 1000`
# truncates toward zero, so a pre-epoch (negative) nanos value with a
# sub-microsecond remainder would land one µs late (ADVICE r10); the
# `(x - pmod(x, 1000)) div 1000` form stays exact for every int64 without
# detouring through doubles (an int64 ns magnitude exceeds 2^53, so
# floor(x / 1000.0) would silently lose precision).


def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    import pyarrow as pa
    import pyarrow.parquet as pq

    # is_timestamp, not unit=='ns' alone: duration('ns')/time64('ns') also
    # report unit 'ns' (and duration stores as plain INT64 → bigint in
    # Spark), so a unit-only probe would rewrite an elapsed-time column
    # into a bogus wall-clock timestamp (r10 review finding)
    return tuple(
        f.name
        for f in pq.read_schema(path)
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
    )


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/{table}.parquet"
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    for col in _nanos_ts_columns(path):
        if dtypes.get(col) == "bigint":
            df = df.withColumn(
                col,
                F.expr(
                    f"timestamp_micros((`{col}` - pmod(`{col}`, 1000)) div 1000)"
                ),
            )
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def events_ts_normalize_filters(sf_dir: str) -> list[dict]:
    """Spec filter-chain stages normalizing ``events.ts`` to TimestampType
    for pipelines that read the raw parquet through the engine's generic
    source (catalog queries go through :func:`load`, which normalizes
    internally). Probes the physical encoding from the parquet footer —
    metadata-only, no data read; see load()'s comment for the three cases.
    Accepts the sf dir or the events.parquet path itself.
    """
    import pyarrow.parquet as pq

    path = sf_dir if sf_dir.endswith(".parquet") else f"{sf_dir}/events.parquet"
    t = pq.read_schema(path).field("ts").type
    # Unit first: Spark's nanosAsLong conf reads TIMESTAMP(NANOS) as bigint
    # regardless of isAdjustedToUTC, so 'timestamp[ns, tz=UTC]' must take the
    # nanos branch, not the tz-aware no-op branch.
    if getattr(t, "unit", None) == "ns":
        # floor-division form — exact for pre-epoch nanos too (see load())
        expr = "timestamp_micros((ts - pmod(ts, 1000)) div 1000)"
    elif getattr(t, "tz", None) is None:
        expr = "cast(ts as timestamp)"
    else:
        return []
    return [
        {"type": "with_column", "name": "ts2", "expr": expr},
        {"type": "drop", "columns": ["ts"]},
        {"type": "rename", "mapping": {"ts2": "ts"}},
    ]


# Deterministic float-aggregate discipline (see exactmath module docstring):
# every float aggregate below goes through exact scaled-integer partials and
# floor-based rounding so Spark-vs-DuckDB hashes can't flip on a .xx5 boundary.
from .operators.dedup import simhash64_oracle_sql  # noqa: E402
from .operators.partitioning import z_interleave_sql  # noqa: E402
from .operators.similarity import lsh_topk_oracle_sql  # noqa: E402
from .exactmath import (  # noqa: E402
    d_round,
    exact_avg,
    exact_sum,
    sql_d_round,
    sql_exact_avg,
    sql_exact_sum,
)

# ---------------------------------------------------------------------------
# Parity core: scan / projection / filter chain / bucketing (SURVEY §2.2 O1-O7)
# ---------------------------------------------------------------------------


@register(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_extendedprice
    FROM lineitem WHERE l_quantity > 45
    """,
    tags=("parity", "scan"),
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel scan + projection (O1/O4): predicate + column pruning reach the
    parquet scan (PushedFilters/ReadSchema in .explain)."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_partkey", "l_extendedprice")
    )


@register(
    "filter_chain",
    oracle="""
    SELECT event_id, user_id, floor(value * 1.1 * 100 + 0.5) / 100.0 AS boosted
    FROM events WHERE event_type = 'purchase' AND value > 50
    """,
    tags=("parity", "filter"),
)
def q_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter chain (O3) driven through the spec engine end-to-end: the
    pipeline spec compiles to predicate → derived column → projection."""
    from .plans.compiler import compile_pipeline
    from .spec import load_spec

    spec = load_spec(
        {
            "in": {"type": "parquet", "path": f"{sf_dir}/events.parquet"},
            "filters": [
                {"type": "filter", "predicate": "event_type = 'purchase' AND value > 50"},
                # 100.0D: Spark SQL parses a bare 100.0 literal as DECIMAL —
                # the D suffix keeps the division in double like the oracle
                {"type": "with_column", "name": "boosted", "expr": "floor(value * 1.1 * 100 + 0.5) / 100.0D"},
                {"type": "select", "columns": ["event_id", "user_id", "boosted"]},
            ],
            "out": {"type": "null"},
        }
    )
    return compile_pipeline(spark, spec)


def _bucket_agg(spark, sf_dir, unit_seconds, alias):
    from .operators.partitioning import bucket_expr

    ev = load(spark, sf_dir, "events")
    unit = "hour" if unit_seconds == 3600 else "day"
    return (
        ev.withColumn(alias, bucket_expr(ev, "ts", unit))
        .groupBy(alias)
        .agg(
            F.count("*").alias("n_events"),
            exact_sum(F.col("value")).alias("sum_value"),
        )
    )


@register(
    "bucket_hour",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket_hour,
           count(*) AS n_events,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
    FROM events GROUP BY 1
    """,
    tags=("parity", "partitioning"),
)
def q_bucket_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp hour bucketing (O5) — the reference's flagship partition key."""
    return _bucket_agg(spark, sf_dir, 3600, "bucket_hour")


@register(
    "bucket_day",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS bucket_day,
           count(*) AS n_events,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
    FROM events GROUP BY 1
    """,
    tags=("parity", "partitioning"),
)
def q_bucket_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bucket_agg(spark, sf_dir, 86400, "bucket_day")


@register(
    "bucket_long_milli",
    oracle="""
    SELECT CAST(floor((epoch_ms(ts) // 1000) / 3600) AS BIGINT) AS bucket_hour,
           count(*) AS n_events
    FROM events GROUP BY 1
    """,
    tags=("parity", "partitioning"),
)
def q_bucket_long_milli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long unix-time bucketing with unit conversion (O6): a milli-precision
    long column divided down to seconds, then hour-bucketed."""
    from .operators.partitioning import bucket_expr

    ev = load(spark, sf_dir, "events").withColumn(
        "ts_ms", F.unix_millis(F.col("ts"))
    )
    return (
        ev.withColumn(
            "bucket_hour", bucket_expr(ev, "ts_ms", "hour", unix_timestamp_unit="milli")
        )
        .groupBy("bucket_hour")
        .agg(F.count("*").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# Relational surface (SURVEY §2.4): aggregations, joins, windows, set ops
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_qty,
           sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_base_price,
           floor((sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0) * 100 + 0.5) / 100.0 AS sum_disc_price,
           floor((sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000 + 0.5) AS BIGINT)) / 1000000.0) * 100 + 0.5) / 100.0 AS sum_charge,
           floor(((sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) / 100.0) / count(*)) * 100 + 0.5) / 100.0 AS avg_qty,
           floor(((sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) / 100.0) / count(*)) * 100 + 0.5) / 100.0 AS avg_price,
           floor(((sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) / 100.0) / count(*)) * 100 + 0.5) / 100.0 AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("relational", "agg"),
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: hash agg with partial (map-side)
    aggregation — one exchange on the two group keys."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast(T.TimestampType()))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity")).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            exact_sum(disc_price, scale=10000).alias("sum_disc_price"),
            exact_sum(disc_price * (1 + F.col("l_tax")), scale=1000000).alias(
                "sum_charge"
            ),
            exact_avg(F.col("l_quantity")).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice")).alias("avg_price"),
            exact_avg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT floor((sum(CAST(floor(l_extendedprice * l_discount * 10000 + 0.5) AS BIGINT)) / 10000.0) * 100 + 0.5) / 100.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("relational", "agg"),
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure scan-filter-agg, no shuffle beyond the final
    single-row reduce; all predicates push to parquet."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast(T.TimestampType()))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast(T.TimestampType()))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        exact_sum(F.col("l_extendedprice") * F.col("l_discount"), scale=10000).alias(
            "revenue"
        )
    )


@register(
    "q3_segment_revenue",
    oracle="""
    SELECT l.l_orderkey,
           floor((sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0) * 100 + 0.5) / 100.0 AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    """,
    tags=("relational", "join"),
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: small dims broadcast (customer → orders), big-side
    shuffle only on the lineitem join key."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast(T.TimestampType())
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-06-30").cast(T.TimestampType())
    )
    return (
        l.join(F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
               l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=10000
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name,
           floor((sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5) AS BIGINT)) / 10000.0) * 100 + 0.5) / 100.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    tags=("relational", "join"),
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multi-join: every dimension is broadcast; the only
    shuffles are lineitem↔orders co-partitioning and the final agg."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast(T.TimestampType()))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast(T.TimestampType()))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), scale=10000
            ).alias("revenue")
        )
    )


@register(
    "topk_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("relational", "window", "topk"),
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via window row_number — the scalable top-k pattern
    (no global sort; one hash exchange on the partition key)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) / 100.0 AS running_value
    FROM events
    """,
    tags=("relational", "window"),
)
def q_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))).over(w) / F.lit(100.0)).alias(
            "running_value"
        ),
    )


@register(
    "setops_segments",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 1000
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
    tags=("relational", "setops"),
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 1000).select("c_custkey")
    seg = c.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")).select(
        "c_custkey"
    )
    return rich.intersect(seg)


@register(
    "rollup_order_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("relational", "agg"),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        exact_sum(F.col("o_totalprice")).alias("total"),
    )


@register(
    "semi_anti_join",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)
      AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount > 0.09)
    """,
    tags=("relational", "join"),
)
def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join (EXISTS / NOT EXISTS) — broadcastable filters."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    hot = li.filter(F.col("l_quantity") > 49).select("l_partkey")
    disc = li.filter(F.col("l_discount") > 0.09).select("l_partkey")
    return (
        p.join(hot, p.p_partkey == hot.l_partkey, "left_semi")
        .join(disc, F.col("p_partkey") == disc.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
    )


@register(
    "json_props_extract",
    oracle="""
    SELECT json_extract_string(props, '$.k') AS k_value, count(*) AS n
    FROM events GROUP BY 1
    """,
    tags=("functions", "json"),
)
def q_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column semantics (reference `json` type, SURVEY §1.3): documents
    kept as canonical text, queried with get_json_object on demand."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.get_json_object(F.col("props"), "$.k").alias("k_value")
    ).agg(F.count("*").alias("n"))


@register(
    "json_variant_gauntlet",
    oracle="""
    SELECT json_extract(props, '$.k')::BIGINT % 10 AS k_mod,
           count(*)::BIGINT AS n,
           sum(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
           min(json(props)::VARCHAR) AS min_txt
    FROM events GROUP BY 1
    """,
    tags=("functions", "json", "variant"),
)
def q_json_variant_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType pilot (SURVEY §7.5.2 revisit, VERDICT r11 item 4): the
    json gauntlet through Spark 4's native VARIANT instead of canonical
    text — ``parse_json`` once, then TYPED access via ``variant_get``
    (no per-query from_json schema; heterogeneous columns keep working)
    and the ``to_json`` canonical re-serialization that text-class sinks
    use. The oracle runs the same gauntlet over DuckDB's canonical json
    text (``json(props)`` compacts identically to Spark's ``to_json``),
    so a variant decode bug, a typed-extraction bug, or a
    re-serialization drift all flip the hash. Canonical-string stays the
    engine DEFAULT for json columns; variant is the spec opt-in
    ``options: {json_type: variant}`` (sources/readers.apply_json_type,
    exercised in tests/test_spec_surface.py)."""
    ev = load(spark, sf_dir, "events")
    v = ev.select(F.parse_json("props").alias("v"))
    return (
        v.select(
            F.expr("variant_get(v, '$.k', 'long')").alias("k"),
            F.to_json("v").alias("txt"),
        )
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("txt").alias("min_txt"),
        )
    )


# ---------------------------------------------------------------------------
# Training-data pipeline operators: dedup / text (SURVEY §2.4 north star)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_dups
    FROM documents GROUP BY 1
    """,
    tags=("dedup",),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groupBy, keep lowest doc_id — one exchange
    on the hash; at 100 TB this is the standard first dedup pass."""
    from .operators.dedup import exact_dedup_groups

    return exact_dedup_groups(load(spark, sf_dir, "documents"), "text", "doc_id")


@register(
    "text_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))::INT AS n_tokens,
           length(text)::INT AS n_chars_computed,
           floor((length(text) * 1.0 / len(string_split(text, ' '))) * 100 + 0.5) / 100.0 AS avg_token_len
    FROM documents
    """,
    tags=("text",),
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality-score inputs, all JVM-side expressions."""
    from .operators.text import text_stats

    return text_stats(load(spark, sf_dir, "documents"))


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS fingerprint
    FROM documents
    """,
    tags=("text", "dedup"),
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint (sorted-token md5) — catches
    shuffled near-dups that exact hashing misses."""
    from .operators.text import fingerprint

    return fingerprint(load(spark, sf_dir, "documents"))


@register(
    "bloom_prefilter_dedup",
    oracle="""
    WITH mx AS (SELECT max(event_id) AS m FROM events)
    SELECT e.event_id, e.user_id, e.event_type, e.value
    FROM events e, mx
    WHERE e.event_id * 10 >= mx.m * 6
      AND NOT EXISTS (
        SELECT 1 FROM events s, mx
        WHERE s.event_id * 10 < mx.m * 8 AND s.event_id = e.event_id
      )
    """,
    tags=("dedup", "runtimefilter", "incremental"),
)
def q_bloom_prefilter_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay-boundary exact dedup through a bloom-bitmap runtime filter
    (operators/runtimefilter.py): a re-delivered feed slice (the last 40%
    of event ids — overlapping the landed corpus, which holds the first
    80%) is reduced to the truly-new rows. The bitmap over the landed key
    set is probed map-side; probe-negative rows skip the anti-join
    entirely (provably absent — a bloom has false positives only), and
    probe-positive rows are re-verified with a real anti-join, so the
    result is bit-equal to the plain anti-join the oracle runs. At 100 TB
    the bitmap is built once per state compaction (one linear pass,
    ~2 bytes/key) and persisted beside the state; each increment then
    pays a narrow delta scan + broadcast probes + an exchange carrying
    only the probe-positive sliver (~fpp of a mostly-new delta) instead
    of the whole delta. Cutoffs use integer math (id*10 vs m*8) so both
    engines slice identically."""
    from .operators.runtimefilter import new_keys_via_bitmap, suggest_m_bits

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    mx = ev.agg(F.max("event_id").alias("m"))
    state = (
        ev.crossJoin(F.broadcast(mx))
        .where(F.col("event_id") * 10 < F.col("m") * 8)
        .select("event_id")
    )
    incoming = (
        ev.crossJoin(F.broadcast(mx))
        .where(F.col("event_id") * 10 >= F.col("m") * 6)
        .drop("m")
    )
    # size from the corpus row count the way a manifest/stats provider
    # would at scale (the state is ~80% of the feed); m only tunes wasted
    # verify work, never correctness
    m_bits = suggest_m_bits(int(ev.count() * 8 // 10))
    return new_keys_via_bitmap(incoming, state, ["event_id"], m_bits)


# ---------------------------------------------------------------------------
# Near-dup detection: MinHash LSH / n-gram Jaccard / SimHash
# ---------------------------------------------------------------------------

_MINHASH_HASHES = 8
_MINHASH_BANDS = 4


def _minhash_oracle(num_hashes: int, bands: int) -> str:
    rows = num_hashes // bands
    p = 2_147_483_647  # operators.dedup.MINHASH_PRIME
    sig_items = ",\n          ".join(
        "list_min(list_transform(hm, h -> ({a} * h + {b}) % {p}))".format(
            a=2 * j + 1, b=j * 1_000_003 + 12_345, p=p
        )
        for j in range(num_hashes)
    )
    band_cases = "\n             ".join(
        "WHEN {b} THEN {key}".format(
            b=b,
            key=" || '|' || ".join(f"sig[{b * rows + r + 1}]" for r in range(rows)),
        )
        for b in range(bands)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                            i -> array_to_string(w[i:i+2], ' ')) AS shingles
      FROM toks
    ), hashed AS (
      SELECT doc_id,
             list_transform(shingles,
               s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {p}) AS hm
      FROM sh
    ), sig AS (
      SELECT doc_id, [{sig_items}] AS sig FROM hashed
    ), banded AS (
      SELECT doc_id, b.band,
             CASE b.band
             {band_cases}
             END AS band_key
      FROM sig, (SELECT unnest(range({bands})) AS band) b
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
                 AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """


def _sig_agree_sql(num_hashes: int, min_matches: int) -> str:
    """Signature-agreement predicate template: format with a=, b= (the two
    sig-carrying relation aliases)."""
    return (
        f"len(list_filter(range(1, {num_hashes + 1}), "
        "i -> {a}.sig[i] = {b}.sig[i])) >= " + str(min_matches)
    )


def _minhash_banded_prelude(num_hashes: int, bands: int) -> str:
    """Shared DuckDB CTE chain over ``documents`` ending in
    ``banded(doc_id, band, band_key, sig)`` — the SQL mirror of
    ``operators.dedup._banded_sig_frame(_minhash_sig_frame(...))``."""
    rows = num_hashes // bands
    p = 2_147_483_647  # operators.dedup.MINHASH_PRIME
    sig_items = ",\n          ".join(
        "list_min(list_transform(hm, h -> ({a} * h + {b}) % {p}))".format(
            a=2 * j + 1, b=j * 1_000_003 + 12_345, p=p
        )
        for j in range(num_hashes)
    )
    band_cases = "\n             ".join(
        "WHEN {b} THEN {key}".format(
            b=b,
            key=" || '|' || ".join(f"sig[{b * rows + r + 1}]" for r in range(rows)),
        )
        for b in range(bands)
    )
    return f"""toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT doc_id,
             list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                            i -> array_to_string(w[i:i+2], ' ')) AS shingles
      FROM toks
    ), hashed AS (
      SELECT doc_id,
             list_transform(shingles,
               s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % {p}) AS hm
      FROM sh
    ), sigs AS (
      SELECT doc_id, [{sig_items}] AS sig FROM hashed
    ), banded AS (
      -- CAST: Spark's band literal is INT32; DuckDB range() is BIGINT
      SELECT doc_id, CAST(b.band AS INTEGER) AS band,
             CASE b.band
             {band_cases}
             END AS band_key,
             sig
      FROM sigs, (SELECT unnest(range({bands})) AS band) b
    )"""


def _incremental_minhash_state_oracle(
    num_hashes: int, bands: int, min_matches: int
) -> str:
    """DuckDB replay of TWO ``incremental_minhash_dedup`` increments through
    the band-index state (operators/dedup.py:524): batch 1 = even doc_ids
    (state starts empty), batch 2 = odd doc_ids deduped against batch 1's
    committed index. Mirrors the operator stage by stage — signatures (same
    md5+modular family as :func:`_minhash_oracle`), within-batch band
    self-join verified by signature agreement, recursive-CTE connected
    components with singleton membership, whole-cluster drop on state hits,
    survivors' band rows appended — so the final (band, band_key, doc_id)
    multiset pins the sink-committed index bit-exactly."""
    agree = _sig_agree_sql(num_hashes, min_matches)

    def batch_ctes(n: int, parity: int, state_cte: str | None) -> str:
        sd = (
            f"""
    sd{n} AS (
      SELECT DISTINCT bb.doc_id
      FROM b{n} bb JOIN {state_cte} st ON bb.band = st.band AND bb.band_key = st.band_key
      JOIN sigs ss ON ss.doc_id = st.doc_id
      WHERE {agree.format(a='bb', b='ss')}
    ),
    dead{n} AS (SELECT DISTINCT cluster_id FROM mem{n} JOIN sd{n} USING (doc_id)),"""
            if state_cte
            else f"""
    dead{n} AS (SELECT NULL::BIGINT AS cluster_id WHERE false),"""
        )
        return f"""
    b{n} AS (SELECT * FROM banded WHERE doc_id % 2 = {parity}),
    w{n} AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM b{n} a JOIN b{n} b ON a.band = b.band AND a.band_key = b.band_key
                            AND a.doc_id < b.doc_id
    ),
    v{n} AS (
      SELECT w{n}.id_a, w{n}.id_b FROM w{n}
      JOIN sigs sa ON sa.doc_id = w{n}.id_a
      JOIN sigs sb ON sb.doc_id = w{n}.id_b
      WHERE {agree.format(a='sa', b='sb')}
    ),
    e{n} AS (SELECT id_a AS src, id_b AS dst FROM v{n}
             UNION SELECT id_b, id_a FROM v{n}),
    reach{n}(node, r) AS (
      SELECT src, src FROM e{n}
      UNION
      SELECT reach{n}.node, e.dst FROM reach{n} JOIN e{n} e ON reach{n}.r = e.src
    ),
    cc{n} AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach{n} GROUP BY node),
    mem{n} AS (
      SELECT s.doc_id, COALESCE(cc{n}.cluster_id, s.doc_id) AS cluster_id
      FROM (SELECT DISTINCT doc_id FROM b{n}) s LEFT JOIN cc{n} USING (doc_id)
    ),{sd}
    surv{n} AS (
      SELECT doc_id FROM mem{n}
      WHERE doc_id = cluster_id
        AND cluster_id NOT IN (SELECT cluster_id FROM dead{n} WHERE cluster_id IS NOT NULL)
    ),
    state{n} AS (SELECT band, band_key, doc_id FROM b{n} JOIN surv{n} USING (doc_id))"""

    return f"""
    WITH RECURSIVE {_minhash_banded_prelude(num_hashes, bands)},{batch_ctes(1, 0, None)},{batch_ctes(2, 1, "state1")}
    SELECT band, band_key, doc_id FROM state1
    UNION ALL
    SELECT band, band_key, doc_id FROM state2
    """


@register(
    "minhash_lsh_candidates",
    oracle=_minhash_oracle(_MINHASH_HASHES, _MINHASH_BANDS),
    tags=("dedup", "lsh"),
)
def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: shingle → md5-minhash signature →
    band keys → self-equi-join on (band, key). The scalable near-dup pass:
    no O(n²) compare, one shuffle on high-cardinality band keys."""
    from .operators.dedup import minhash_candidates

    return minhash_candidates(
        load(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        num_hashes=_MINHASH_HASHES,
        bands=_MINHASH_BANDS,
    )


@register(
    "minhash_lsh_128x16",
    oracle=_minhash_oracle(128, 16),
    tags=("dedup", "lsh"),
)
def q_minhash_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH at PRODUCTION parameterization (128 hashes / 16 bands —
    the classic web-dedup setting; the 8/4 entry above is the toy size).
    Same single-md5-per-shingle design: the extra 120 hash family members are
    modular arithmetic over the already-computed base hash, so the per-doc
    cost stays within ~2x of the toy configuration (BASELINE.md §3 records
    the measured ratio)."""
    from .operators.dedup import minhash_candidates

    return minhash_candidates(
        load(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        num_hashes=128,
        bands=16,
    )


def _minhash_decontaminate_oracle(
    num_hashes: int, bands: int, min_matches: int, bench_mod: int
) -> str:
    """DuckDB replay of ``minhash_decontaminate``: benchmark = doc_id %
    bench_mod == 0, corpus = the rest; corpus docs whose banded signatures
    agree with any benchmark doc at >= min_matches positions are dropped."""
    agree = _sig_agree_sql(num_hashes, min_matches)
    return f"""
    WITH {_minhash_banded_prelude(num_hashes, bands)},
    cb AS (SELECT * FROM banded WHERE doc_id % {bench_mod} <> 0),
    bb AS (SELECT doc_id AS b_id, band, band_key, sig FROM banded
           WHERE doc_id % {bench_mod} = 0),
    cont AS (
      SELECT cb.doc_id,
             CAST(max(len(list_filter(range(1, {num_hashes + 1}),
                       i -> cb.sig[i] = bb.sig[i]))) AS INTEGER) AS n_match
      FROM cb JOIN bb ON cb.band = bb.band AND cb.band_key = bb.band_key
      WHERE {agree.format(a='cb', b='bb')}
      GROUP BY cb.doc_id
    )
    SELECT d.doc_id, COALESCE(c.n_match, 0) AS n_match,
           c.doc_id IS NOT NULL AS contaminated
    FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % {bench_mod} <> 0) d
    LEFT JOIN cont c USING (doc_id)
    """


@register(
    "decontaminate_fuzzy",
    oracle=_minhash_decontaminate_oracle(_MINHASH_HASHES, _MINHASH_BANDS, 6, 7),
    tags=("dedup", "lsh", "decontamination"),
)
def q_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY benchmark decontamination: corpus docs (doc_id % 7 != 0)
    near-duplicating any benchmark doc (doc_id % 7 == 0) by banded MinHash
    + integer signature agreement are flagged — the paraphrase-robust
    sibling of the exact n-gram `contamination_ngram` pass. Scale: the
    cross-corpus (band, band_key) equi-join shuffles the corpus once on
    band keys, never O(corpus × benchmark); the benchmark side (eval
    suites) is broadcast-sized in practice. Output: every corpus doc with
    its max agreement count and the drop verdict, so the hash pins both
    the flagged set and the estimator values."""
    from .operators.dedup import minhash_decontaminate

    docs = load(spark, sf_dir, "documents")
    _, cont = minhash_decontaminate(
        docs.filter(F.col("doc_id") % 7 != 0),
        docs.filter(F.col("doc_id") % 7 == 0),
        "text",
        "doc_id",
        num_hashes=_MINHASH_HASHES,
        bands=_MINHASH_BANDS,
        min_matches=6,
    )
    return (
        docs.filter(F.col("doc_id") % 7 != 0)
        .select("doc_id")
        .distinct()
        .join(cont, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_match"), F.lit(0)).cast("int").alias("n_match"),
            F.col("n_match").isNotNull().alias("contaminated"),
        )
    )


@register(
    "dedup_incremental_state",
    oracle=_incremental_minhash_state_oracle(_MINHASH_HASHES, _MINHASH_BANDS, 6),
    tags=("dedup", "incremental", "sink"),
)
def q_dedup_incremental_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verifies the INCREMENTAL near-dup state pipeline end to end
    (VERDICT r3 item 7 — bench+pytest-only through round 3): two
    deterministic batches (even doc_ids, then odd) run through
    ``incremental_minhash_dedup`` with the band index persisted through the
    real pointer-committed merge sink between them, then the COMMITTED
    index read back via the manifest. The oracle replays both increments in
    SQL — signatures, band self-join, signature-agreement verify,
    recursive-CTE clustering, whole-cluster drop on state hits — so the
    hash pins the operator AND the sink's on-disk truth together
    (cf. embulk-executor-mapreduce's golden e2e multiset contract,
    TestMapReduceExecutor.java:311-331)."""

    from .operators.dedup import incremental_minhash_dedup
    from .sinks.writer import read_merge_state, write_sink
    from .spec import SinkSpec

    docs = load(spark, sf_dir, "documents")
    path = scratch_dir("q_incr_state_") + "/band_index"
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("doc_id", "band"),
        merge_order=("band_key",),
    )
    kw = dict(
        num_hashes=_MINHASH_HASHES, bands=_MINHASH_BANDS, min_matches=6
    )
    _, d1 = incremental_minhash_dedup(
        docs.filter(F.col("doc_id") % 2 == 0), None, "text", "doc_id", **kw
    )
    write_sink(d1, sink)
    _, d2 = incremental_minhash_dedup(
        docs.filter(F.col("doc_id") % 2 == 1),
        read_merge_state(spark, path),
        "text",
        "doc_id",
        **kw,
    )
    write_sink(d2, sink)
    return read_merge_state(spark, path).select("band", "band_key", "doc_id")


@register(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_minhash_oracle(_MINHASH_HASHES, _MINHASH_BANDS)}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
    )
    SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
    """,
    tags=("dedup", "iterative"),
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster formation: transitive closure over the MinHash
    candidate pairs via iterative min-label propagation (A~B, B~C ⇒ one
    cluster — pairs alone under-merge). Spark runs the bounded label-
    propagation loop (per-iteration: one join + min-agg, lineage truncated
    with localCheckpoint); the oracle is DuckDB's recursive-CTE closure."""
    from .operators.dedup import connected_components, minhash_candidates

    pairs = minhash_candidates(
        load(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        num_hashes=_MINHASH_HASHES,
        bands=_MINHASH_BANDS,
    )
    return connected_components(pairs)


@register(
    "dedup_survivors",
    oracle="""
    WITH RECURSIVE pairs AS ({_mh}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    clusters AS (
      SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
    )
    SELECT d.doc_id, d.source, d.n_chars FROM documents d
    WHERE d.doc_id NOT IN (
      SELECT doc_id FROM clusters WHERE doc_id <> cluster_id
    )
    """.replace("{_mh}", _minhash_oracle(_MINHASH_HASHES, _MINHASH_BANDS)),
    tags=("dedup", "end-to-end"),
)
def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus dedup: MinHash+LSH candidates → transitive cluster
    formation → survivor selection (cluster_id IS the min doc id by
    construction) → anti-join the non-survivor duplicates out of the corpus.
    The full production near-dup flow as one composable plan."""
    from .operators.dedup import connected_components, minhash_candidates

    docs = load(spark, sf_dir, "documents")
    clusters = connected_components(
        minhash_candidates(
            docs, "text", "doc_id",
            num_hashes=_MINHASH_HASHES, bands=_MINHASH_BANDS,
        )
    )
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    return docs.join(losers, "doc_id", "left_anti").select(
        "doc_id", "source", "n_chars"
    )


@register(
    "ngram_jaccard_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_distinct(
               list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                              i -> array_to_string(w[i:i+2], ' '))) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), ex0 AS (
      SELECT doc_id, unnest(sh) AS s FROM toks
    ), keep AS (
      SELECT s FROM (SELECT s, count(*) AS dfreq FROM ex0 GROUP BY s)
      WHERE dfreq <= 100
    ), ex AS (
      SELECT ex0.doc_id, ex0.s FROM ex0 JOIN keep USING (s)
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           floor((n_common / (sa.n + sb.n - n_common)) * 10000 + 0.5) / 10000.0 AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE floor((n_common / (sa.n + sb.n - n_common)) * 10000 + 0.5) / 10000.0 >= 0.05
    """,
    tags=("dedup",),
)
def q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard over pairs sharing ≥1 shingle (verification stage
    after LSH candidate generation), with the stop-shingle document-frequency
    cap that bounds the self-join at corpus scale."""
    from .operators.dedup import jaccard_pairs

    # explicit cap pins the static oracle; production callers use the
    # default max_doc_freq="auto" (corpus-sized via jaccard_max_doc_freq)
    return jaccard_pairs(
        load(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        threshold=0.05,
        max_doc_freq=100,
    )


@register(
    "simhash64",
    oracle=simhash64_oracle_sql("documents", "text", "doc_id"),
    tags=("dedup",),
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc. Token bits come from portable md5 folds (the
    same construction MinHash uses), so the full bit vector is verified by a
    generated DuckDB oracle; Hamming-distance properties are additionally
    covered in tests/test_dedup.py."""
    from .operators.dedup import simhash64

    return simhash64(load(spark, sf_dir, "documents"), "text", "doc_id")


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


#: shared by ann_bruteforce_topk and the recall report (ground truth side);
#: the text is byte-identical to the original inline oracle, so the
#: long-green row's verification hash is unchanged
_BRUTE_TOPK_SQL = """
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id IN (0, 1, 2, 3)
    ), scored AS (
      SELECT q.query_id, c.vec_id AS cand_id,
             floor((
               list_dot_product(q.qv, c.v)
               / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v)))
             ) * 1000000 + 0.5) / 1000000.0 AS cos_sim
      FROM q, base c WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, cand_id, cos_sim FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """


@register(
    "ann_bruteforce_topk",
    oracle=_BRUTE_TOPK_SQL,
    tags=("similarity",),
)
def q_ann_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast probe vectors over one candidate scan.
    Dot products fold sequentially over doubles — bit-identical to DuckDB's
    list_dot_product, so the oracle compares rounded cosines safely."""
    from .operators.similarity import brute_force_topk

    return brute_force_topk(load(spark, sf_dir, "embeddings"))


@register("ann_lsh_topk", oracle=lsh_topk_oracle_sql(), tags=("similarity", "lsh"))
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane bucketing. The hyperplanes are
    deterministic ±1 constants, so the exact candidate set — not just recall
    — is reproducible; the generated DuckDB oracle inlines the same planes
    as array literals. Recall vs brute force additionally asserted in
    tests/test_dedup_similarity.py."""
    from .operators.similarity import lsh_bucket_topk

    return lsh_bucket_topk(load(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# More text analysis: language ID, quality scoring
# ---------------------------------------------------------------------------


@register(
    "language_id",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents
    ), s AS (
      SELECT doc_id, list_max([
        {'hits': len(list_intersect(toks, ['der','die','das','und'])), 'rank': 4, 'lang': 'de'},
        {'hits': len(list_intersect(toks, ['the','a','of','and'])),    'rank': 3, 'lang': 'en'},
        {'hits': len(list_intersect(toks, ['el','la','los','y'])),     'rank': 2, 'lang': 'es'},
        {'hits': len(list_intersect(toks, ['le','la','les','et'])),    'rank': 1, 'lang': 'fr'}
      ]) AS best
      FROM t
    )
    SELECT doc_id, best.lang AS lang_guess, best.hits::INT AS marker_hits FROM s
    """,
    tags=("text",),
)
def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID (argmax with deterministic tie-break)."""
    from .operators.text import language_id

    return language_id(load(spark, sf_dir, "documents"))


@register(
    "quality_score",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tok,
             length(text) * 1.0 / len(string_split(text, ' ')) AS mean_len,
             len(list_intersect(string_split(text, ' '),
                                ['the','a','of','and'])) > 0 AS has_stop
      FROM documents
    )
    SELECT doc_id, floor((
        (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END)
      + (CASE WHEN has_stop THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
      + (CASE WHEN mean_len BETWEEN 3.0 AND 12.0 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
      ) * 100 + 0.5) / 100.0 AS quality
    FROM t
    """,
    tags=("text",),
)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import quality_score

    return quality_score(load(spark, sf_dir, "documents"))


@register(
    "quality_prune_per_source",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tok,
             length(text) * 1.0 / len(string_split(text, ' ')) AS mean_len,
             len(list_intersect(string_split(text, ' '),
                                ['the','a','of','and'])) > 0 AS has_stop
      FROM documents
    ), q AS (
      SELECT doc_id, floor((
          (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END)
        + (CASE WHEN has_stop THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
        + (CASE WHEN mean_len BETWEEN 3.0 AND 12.0 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
        ) * 100 + 0.5) / 100.0 AS quality
      FROM t
    ), scored AS (
      SELECT d.doc_id, d.source, q.quality
      FROM documents d JOIN q USING (doc_id)
    ), levels AS (
      SELECT source, quality, count(*) AS c FROM scored GROUP BY 1, 2
    ), lv AS (
      SELECT source, quality, c,
             COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY quality DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_above,
             SUM(c) OVER (PARTITION BY source) AS n
      FROM levels
    ), lv2 AS (
      SELECT source, quality, c,
             GREATEST(0, LEAST(c,
               (n * 600000 + 999999) // 1000000 - cum_above)) AS take
      FROM lv
    )
    SELECT s.doc_id, s.source, s.quality
    FROM scored s JOIN lv2 l ON s.source = l.source AND s.quality = l.quality
    WHERE l.take = l.c
       OR (('0x' || substr(md5(s.doc_id::VARCHAR), 1, 15))::BIGINT % 1000000)
          * l.c < l.take * 1000000
    """,
    tags=("text", "quality", "sampling"),
)
def q_quality_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality pruning (keep ~the top 60% of each source by
    quality score). The scale-honest shape: counts over the coarse quality
    domain (sources×8 rows) + windows over THAT bounded frame + a
    deterministic md5-hash fraction at the single boundary level — never a
    per-source rank window over the docs (which would totally order a
    billion-doc source in one task). See
    operators/text.py::quality_prune_per_source."""
    from .operators.text import quality_prune_per_source

    return quality_prune_per_source(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Multimodal plumbing / as-of join / sessionization
# ---------------------------------------------------------------------------


@register(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           md5(text) AS content_hash,
           CAST(1 + octet_length(encode(text)) % 1024 AS INT) AS width,
           CAST(1 + octet_length(encode(text)) % 768 AS INT) AS height
    FROM documents
    """,
    tags=("multimodal",),
)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: text → binary payload + metadata → Arrow-batched
    mapInPandas decode stub (real decoder swaps in; plumbing is production-
    shaped). Feature floats excluded from the oracle projection."""
    from .operators.multimodal import decode_stub, to_binary

    return decode_stub(to_binary(load(spark, sf_dir, "documents"))).select(
        "doc_id", "n_bytes", "content_hash", "width", "height"
    )


@register(
    "multimodal_decode_png",
    oracle="""
    SELECT doc_id,
           CAST(2 AS INT) AS width,
           CAST(2 AS INT) AS height,
           CAST(('0x' || substr(md5(text), 1, 2)) AS INT) AS q_tl,
           CAST(('0x' || substr(md5(text), 3, 2)) AS INT) AS q_tr,
           CAST(('0x' || substr(md5(text), 5, 2)) AS INT) AS q_bl,
           CAST(('0x' || substr(md5(text), 7, 2)) AS INT) AS q_br
    FROM documents
    """,
    tags=("multimodal", "real-decode"),
)
def q_multimodal_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, driver-gated (r5): every document becomes a
    genuine 2×2 greyscale PNG (pixels = first 4 md5 bytes of the text,
    per-row filters cycling None/Sub/Up), then the stdlib decoder inflates,
    unfilters and reduces it to luminance-quadrant features. A grey pixel's
    quadrant mean is the pixel byte itself, so round(feature·255) must
    equal the md5 byte — a full value-hash oracle over a real PNG
    encode→decode roundtrip, exercised on every driver round (no Pillow
    needed)."""
    from .operators.multimodal import decode_image_stdlib, encode_text_png

    dec = decode_image_stdlib(
        encode_text_png(load(spark, sf_dir, "documents"))
    )
    return dec.select(
        "doc_id",
        "width",
        "height",
        *[
            F.round(dec["features"][i] * 255).cast("int").alias(n)
            for i, n in enumerate(("q_tl", "q_tr", "q_bl", "q_br"))
        ],
    )


@register(
    "multimodal_decode_jpeg",
    oracle="""
    SELECT doc_id,
           CAST(16 AS INT) AS width,
           CAST(16 AS INT) AS height,
           CAST(('0x' || substr(md5(text), 1, 2)) AS INT) AS q_tl,
           CAST(('0x' || substr(md5(text), 3, 2)) AS INT) AS q_tr,
           CAST(('0x' || substr(md5(text), 5, 2)) AS INT) AS q_bl,
           CAST(('0x' || substr(md5(text), 7, 2)) AS INT) AS q_br
    FROM documents
    """,
    tags=("multimodal", "real-decode"),
)
def q_multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode, driver-gated (r6, VERDICT r5 item 2):
    every document becomes a genuine 16×16 grayscale baseline JPEG — four
    constant 8×8 blocks holding the first 4 md5 bytes of the text, standard
    Annex-K Huffman tables, DC quant 8 — and the stdlib decoder Huffman-
    decodes the DC prediction chain, dequantizes, and runs the numpy IDCT.
    A constant block survives the quant-8 DCT roundtrip bit-exactly, so
    each luminance-quadrant mean IS the md5 byte: a full value-hash oracle
    over a real JPEG encode→decode roundtrip (no Pillow needed)."""
    from .operators.multimodal import decode_image_stdlib, encode_text_jpeg

    dec = decode_image_stdlib(
        encode_text_jpeg(load(spark, sf_dir, "documents"))
    )
    return dec.select(
        "doc_id",
        "width",
        "height",
        *[
            F.round(dec["features"][i] * 255).cast("int").alias(n)
            for i, n in enumerate(("q_tl", "q_tr", "q_bl", "q_br"))
        ],
    )


@register(
    "multimodal_decode_wav",
    oracle="""
    SELECT doc_id,
           CAST(16000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST(16 AS INT) AS n_samples,
           CAST(('0x' || substr(md5(text), 1, 2)) AS INT) AS a_s1,
           CAST(('0x' || substr(md5(text), 3, 2)) AS INT) AS a_s2,
           CAST(('0x' || substr(md5(text), 5, 2)) AS INT) AS a_s3,
           CAST(('0x' || substr(md5(text), 7, 2)) AS INT) AS a_s4
    FROM documents
    """,
    tags=("multimodal", "audio", "real-decode"),
)
def q_multimodal_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, driver-gated (r6): every document becomes a
    genuine 16-sample mono PCM16 WAV (segment amplitudes = first 4 md5
    bytes × 128, alternating sign) and the stdlib RIFF decoder parses the
    chunk walk, de-interleaves PCM frames, and reduces to segment mean-abs
    features — each exactly byte/256, so round(feature·256) IS the md5
    byte: a full value-hash oracle over a real WAV encode→decode
    roundtrip."""
    from .operators.multimodal import decode_audio_stdlib, encode_text_wav

    dec = decode_audio_stdlib(encode_text_wav(load(spark, sf_dir, "documents")))
    return dec.select(
        "doc_id",
        "sample_rate",
        "n_channels",
        "n_samples",
        *[
            F.round(dec["features"][i] * 256).cast("int").alias(f"a_s{i + 1}")
            for i in range(4)
        ],
    )


@register(
    "multimodal_resize_real",
    oracle="""
    SELECT doc_id,
           CAST(16 AS INT) AS width,
           CAST(16 AS INT) AS height,
           CAST(2 AS INT) AS out_width,
           CAST(2 AS INT) AS out_height,
           CAST(('0x' || substr(md5(text), 1, 2)) AS INT) AS p_tl,
           CAST(('0x' || substr(md5(text), 3, 2)) AS INT) AS p_tr,
           CAST(('0x' || substr(md5(text), 5, 2)) AS INT) AS p_bl,
           CAST(('0x' || substr(md5(text), 7, 2)) AS INT) AS p_br
    FROM documents
    """,
    tags=("multimodal", "real-decode"),
)
def q_multimodal_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize on the stdlib decode path (r6): each document's
    16×16 generated JPEG decodes and AREA-AVERAGES down to 2×2 — each
    output pixel is the exact box mean of one constant 8×8 block, i.e. the
    md5 byte, so the decode→resize pipeline carries a full value-hash
    oracle. (The integer-math resize_stub remains for plumbing benches;
    this is the decoded-pixel path a vision preprocessor needs.)"""
    from .operators.multimodal import encode_text_jpeg, resize_image_stdlib

    rs = resize_image_stdlib(
        encode_text_jpeg(load(spark, sf_dir, "documents")), 2, 2
    )
    return rs.select(
        "doc_id",
        "width",
        "height",
        "out_width",
        "out_height",
        *[
            F.round(rs["pixels"][i] * 255).cast("int").alias(n)
            for i, n in enumerate(("p_tl", "p_tr", "p_bl", "p_br"))
        ],
    )


@register(
    "multimodal_decode_video",
    oracle="""
    SELECT doc_id,
           CAST(4 AS INT) AS n_frames,
           CAST(t.i AS INT) AS frame_idx,
           CAST(16 AS INT) AS width,
           CAST(16 AS INT) AS height,
           CAST(('0x' || substr(md5(text), 8 * t.i + 1, 2)) AS INT) AS q_tl,
           CAST(('0x' || substr(md5(text), 8 * t.i + 3, 2)) AS INT) AS q_tr,
           CAST(('0x' || substr(md5(text), 8 * t.i + 5, 2)) AS INT) AS q_bl,
           CAST(('0x' || substr(md5(text), 8 * t.i + 7, 2)) AS INT) AS q_br
    FROM documents, unnest(range(4)) t(i)
    """,
    tags=("multimodal", "video", "real-decode"),
)
def q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode, driver-gated (r6): every document becomes a
    genuine 4-frame MJPEG AVI (frame i = the 16×16 quadrant JPEG over md5
    bytes 4i..4i+3 — all 16 digest bytes used across the clip), the RIFF
    demuxer walks hdrl/movi and the baseline JPEG decoder runs per frame —
    one output row per frame with exact quadrant luminances, a full
    value-hash oracle over a real container+codec roundtrip. (The
    frame-sample stub stays for plumbing benches; ffmpeg slots in for
    H.264+ with this exact batch shape.)"""
    from .operators.multimodal import decode_video_stdlib, encode_text_avi

    dec = decode_video_stdlib(
        encode_text_avi(load(spark, sf_dir, "documents")), stride=1
    )
    return dec.select(
        "doc_id",
        "n_frames",
        "frame_idx",
        "width",
        "height",
        *[
            F.round(dec["features"][i] * 255).cast("int").alias(n)
            for i, n in enumerate(("q_tl", "q_tr", "q_bl", "q_br"))
        ],
    )


@register(
    "asof_last_signup",
    oracle="""
    SELECT e.event_id, e.user_id, epoch_us(s.ts) AS signup_us
    FROM events e
    ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
      ON e.user_id = s.user_id AND e.ts >= s.ts
    """,
    tags=("relational", "asof"),
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (no Spark built-in): union-tag + last(ignoreNulls) window —
    one exchange on the key, no per-key merge loop. Oracle uses DuckDB's
    native ASOF JOIN (same semantics: latest right row with ts <= left ts)."""
    from .operators.relational import asof_join

    ev = load(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    joined = asof_join(
        ev.select("event_id", "user_id", "ts"),
        signups.withColumnRenamed("signup_ts", "ts"),
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_cols=["ts"],
    )
    return joined.select(
        "event_id", "user_id", F.unix_micros(F.col("ts_asof")).alias("signup_us")
    )


@register(
    "sessionize_events",
    oracle="""
    SELECT event_id, user_id, session_seq FROM (
      SELECT event_id, user_id,
             sum(CASE WHEN gap_us IS NULL OR gap_us > 1800 * 1000000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_seq
      FROM (
        SELECT event_id, user_id, ts,
               epoch_us(ts) - epoch_us(lag(ts) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        FROM events
      )
    )
    """,
    tags=("relational", "session"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 30 min starts a new session (lag + running sum
    of session breaks; integer-microsecond gap math on both sides)."""
    from .operators.relational import sessionize

    ev = load(spark, sf_dir, "events")
    return sessionize(ev, key="user_id", ts="ts", gap_seconds=1800).select(
        "event_id", "user_id", F.col("session_seq").cast(T.LongType()).alias("session_seq")
    )


@register(
    "upsample_by_weight",
    oracle="""
    WITH w AS (
      SELECT doc_id, source, n_chars,
             CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
                  ELSE 0.25 END AS wt,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000000
               AS frac_hash
      FROM documents
    ), rep AS (
      SELECT doc_id, source, n_chars,
             (CAST(floor(wt) AS BIGINT)
              + CASE WHEN frac_hash < (wt - floor(wt)) * 1000000
                     THEN 1 ELSE 0 END) AS n_copies
      FROM w
    )
    SELECT doc_id, source, n_chars,
           unnest(range(0, n_copies))::BIGINT AS copy_idx
    FROM rep WHERE n_copies > 0
    """,
    tags=("sampling", "mixing", "training"),
)
def q_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted up/down-sampling for training mixes: source
    weight 2.5 → every doc twice plus a hash-selected 50% third copy; 0.25 →
    a hash-selected quarter. floor(w) copies + one more when
    md5-fraction < frac(w) — reproducible under retry (content hash, no
    rand()), fan-out inside codegen via sequence+explode, no shuffle."""
    docs = load(spark, sf_dir, "documents")
    wt = (
        F.when(F.col("source") == "src0", F.lit(2.5))
        .when(F.col("source") == "src1", F.lit(1.0))
        .otherwise(F.lit(0.25))
    )
    frac_hash = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        % 1_000_000
    )
    n_copies = (
        F.floor(wt).cast("long")
        + F.when(frac_hash < (wt - F.floor(wt)) * 1_000_000, 1).otherwise(0)
    )
    return (
        docs.select(
            "doc_id", "source", "n_chars", n_copies.alias("n_copies")
        )
        .filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("n_copies") - 1)
            ).alias("copy_idx"),
        )
    )


@register(
    "value_histogram",
    oracle="""
    SELECT CAST(CASE WHEN value < 0 THEN -1
                WHEN value >= 1000 THEN 20
                ELSE floor(value / 50.0) END AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events
    GROUP BY bucket
    """,
    tags=("agg", "histogram"),
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin value histogram (20 bins over [0,1000), under/overflow
    bins) — one map-side-combinable aggregate; clamped floor bin math is
    IEEE-identical cross-engine, exact-cents sums per bin."""
    ev = load(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 0, F.lit(-1))
        .when(F.col("value") >= 1000, F.lit(20))
        .otherwise(F.floor(F.col("value") / F.lit(50.0)))
        .cast("long")
    )
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("sum_cents"),
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH su AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), act AS (
      SELECT DISTINCT e.user_id,
             CAST(floor(date_diff('day', su.cohort_week, CAST(e.ts AS DATE))
                        / 7) AS BIGINT) AS week_n
      FROM events e JOIN su ON e.user_id = su.user_id
      WHERE CAST(e.ts AS DATE) >= su.cohort_week
    )
    SELECT su.cohort_week, act.week_n,
           count(DISTINCT act.user_id) AS n_active,
           (SELECT count(*) FROM su s2 WHERE s2.cohort_week = su.cohort_week)
             AS cohort_size
    FROM su JOIN act ON su.user_id = act.user_id
    GROUP BY su.cohort_week, act.week_n
    """,
    tags=("relational", "retention", "events"),
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by signup week, activity
    counted per whole week since cohort start. The per-user cohort map joins
    user-equi under AQE (it grows with the corpus — never broadcast); only
    the per-week size table (bounded by calendar weeks) is broadcast."""
    ev = load(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week"))
    )
    sizes = su.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    act = (
        ev.select("user_id", F.col("ts").cast("date").alias("d"))
        .join(su, "user_id")
        .filter(F.col("d") >= F.col("cohort_week"))
        .select(
            "user_id",
            "cohort_week",
            F.floor(F.datediff(F.col("d"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_n"),
        )
        .distinct()
    )
    return (
        act.groupBy("cohort_week", "week_n")
        .agg(F.countDistinct("user_id").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select("cohort_week", "week_n", "n_active", "cohort_size")
    )


@register(
    "session_paths_topk",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id FROM events
    ), paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM ordered GROUP BY user_id
    )
    SELECT path, count(*) AS n_users FROM paths
    GROUP BY path ORDER BY n_users DESC, path LIMIT 20
    """,
    tags=("relational", "paths", "events"),
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k user event paths: per-user event-type sequence in (ts, event_id)
    order, counted corpus-wide. Deterministic ordering via array_sort over
    (ts, event_id, type) structs — collect_list alone is order-unstable;
    TakeOrdered merge for the top-k, no global sort."""
    ev = load(spark, sf_dir, "events")
    paths = (
        ev.groupBy("user_id")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("ts"), F.col("event_id"), F.col("event_type")
                            )
                        )
                    ),
                    lambda s: s.event_type,
                ),
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path"))
        .limit(20)
    )


@register(
    "zorder_cluster_key",
    oracle="""
    SELECT l_orderkey, l_partkey, {z} AS zval
    FROM (
      SELECT l_orderkey, l_partkey,
             l_orderkey % 1024 AS za, l_partkey % 1024 AS zb
      FROM lineitem WHERE l_orderkey < 1000
    )
    """.format(z=z_interleave_sql("za", "zb")),
    tags=("partitioning", "zorder"),
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (orderkey, partkey) low bits —
    combine with repartitionByRange(zval) + sink sort_by for multi-column
    data-skipping layout at 100 TB. Pure long bit arithmetic in codegen."""
    from .operators.partitioning import z_interleave

    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_partkey",
        z_interleave(
            F.col("l_orderkey") % 1024, F.col("l_partkey") % 1024
        ).alias("zval"),
    )


@register(
    "quantize_embeddings_int8",
    oracle="""
    WITH b AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ), s AS (
      SELECT vec_id, label, v,
             list_max(list_transform(v, x -> abs(x))) AS mx
      FROM b
    )
    SELECT vec_id, label,
           CASE WHEN mx = 0 THEN 0.0 ELSE 127.0 / mx END AS scale,
           to_json(list_transform(
             v, x -> CAST(CASE WHEN mx = 0 THEN 0
                          ELSE floor(x * (127.0 / mx) + 0.5) END AS INTEGER)
           ))::VARCHAR AS q_json
    FROM s
    """,
    tags=("similarity", "quantization"),
)
def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization (symmetric max-abs scaling): per-vector
    scale = 127/max|x|, values floor(x*scale+0.5) — 4× storage cut for the
    ANN corpus. Pure array expressions in codegen, zero shuffle; floor-based
    rounding is IEEE-identical cross-engine (exactmath discipline). The
    quantized vector is emitted as its canonical JSON encoding (``[1,2,3]``)
    — a scalar string column, stable to hash and diff in any downstream
    tool, unlike a raw array column."""
    emb = load(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    mx = F.array_max(F.transform(v, F.abs))
    scale = F.when(mx == 0, F.lit(0.0)).otherwise(F.lit(127.0) / mx)
    return emb.select(
        "vec_id",
        "label",
        scale.alias("scale"),
        F.to_json(
            F.transform(
                v,
                lambda x: F.when(mx == 0, F.lit(0))
                .otherwise(F.floor(x * (F.lit(127.0) / mx) + F.lit(0.5)))
                .cast("int"),
            )
        ).alias("q_json"),
    )


@register(
    "funnel_signup_purchase",
    oracle="""
    WITH su AS (
      SELECT user_id, min(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), conv AS (
      SELECT su.user_id, su.signup_ts, min(e.ts) AS first_purchase_ts
      FROM su LEFT JOIN events e
        ON e.user_id = su.user_id AND e.event_type = 'purchase'
       AND e.ts >= su.signup_ts
      GROUP BY su.user_id, su.signup_ts
    )
    SELECT CAST(signup_ts AS DATE) AS signup_day,
           count(*) AS n_signups,
           count(first_purchase_ts) AS n_converted,
           CAST(sum((epoch_us(first_purchase_ts) - epoch_us(signup_ts))
                    // 1000000) AS BIGINT) AS total_latency_sec
    FROM conv GROUP BY signup_day
    """,
    tags=("relational", "funnel", "events"),
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-funnel conversion: each user's first signup, their first purchase
    AT-OR-AFTER it (user-equi join + range predicate — SMJ on user_id, never
    a time cross-join), rolled up per signup day with exact integer-second
    latency totals. The standard product-analytics funnel as one plan."""
    ev = load(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    pu = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu_user"), F.col("ts").alias("pts")
    )
    conv = (
        su.join(
            pu,
            (F.col("user_id") == F.col("pu_user"))
            & (F.col("pts") >= F.col("signup_ts")),
            "left",
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("pts").alias("first_purchase_ts"))
    )
    lat_sec = (
        F.unix_micros(F.col("first_purchase_ts"))
        - F.unix_micros(F.col("signup_ts"))
    ).cast("long") / F.lit(1_000_000)
    return conv.groupBy(F.to_date("signup_ts").alias("signup_day")).agg(
        F.count(F.lit(1)).alias("n_signups"),
        F.count("first_purchase_ts").alias("n_converted"),
        F.sum(F.floor(lat_sec)).cast("long").alias("total_latency_sec"),
    )


@register(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           TRUE AS users_ok,
           TRUE AS median_rank_ok
    FROM events GROUP BY event_type
    """,
    tags=("agg", "approx"),
)
def q_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates, verified by their BOUNDS: raw HLL/quantile
    sketch values differ across engines, so the query emits (a) the exact
    distinct count (hash-checked against the oracle) and (b) booleans
    asserting the sketches' error guarantees — |approx−exact| within 15%
    (HLL default rsd 5%, 3σ) and the approx median's rank inside the 40-60%
    band (percentile_approx default accuracy 1e4). The oracle emits TRUE for
    the booleans, so a sketch drifting out of bounds FAILS the hash — a
    stronger check than rows-only, portable across engines."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_median"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    rank = (
        ev.join(F.broadcast(agg.select("event_type", "approx_median")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("value") <= F.col("approx_median"), 1).otherwise(0)
            ).alias("n_le"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    users_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users")) * 100
        <= F.greatest(F.lit(200), F.col("exact_users") * 15)
    ).alias("users_ok")
    median_rank_ok = (
        (F.col("n_le") * 100 >= F.col("n") * 40)
        & (F.col("n_le") * 100 <= F.col("n") * 60)
    ).alias("median_rank_ok")
    return agg.join(rank, "event_type").select(
        "event_type", "exact_users", users_ok, median_rank_ok
    )


# ---------------------------------------------------------------------------
# Structured Streaming (bounded replay of the incremental path)
# ---------------------------------------------------------------------------


@register(
    "stream_hourly_counts",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS window_start_sec,
           event_type,
           count(*) AS n_events,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def q_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed agg driven to completion with availableNow —
    the incremental result must equal the batch group-by (oracle)."""
    from .streaming.ingest import (
        hourly_counts_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    stream = hourly_counts_stream(read_events_stream(spark, sf_dir))
    return run_stream_to_memory(stream, "stream_hourly_counts", output_mode="complete")


@register(
    "stream_parser_ingest",
    oracle="""
    SELECT event_type, count(*) AS n,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total,
           max(event_id) AS max_id
    FROM events WHERE value > 10 GROUP BY event_type
    """,
    tags=("streaming", "ltsv"),
)
def q_stream_parser_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming parser ingest e2e: the engine writes an LTSV landing dir,
    then the STREAMING front door tails it — the identical expression
    parse chain as batch (sources/lineparsers.py), the same filter stage,
    an exactly-once parquet sink — and the committed result must equal the
    batch aggregate on the original table (oracle). The log-tail shape a
    100 TB ingest actually runs: landing dir → readStream.text → codegen
    parse → availableNow replay."""
    from .plans.compiler import run_pipeline, run_pipeline_streaming
    from .spec import load_spec

    root = scratch_dir("stream_ltsv_")
    land, sinkdir = root + "/landing", root + "/out"
    run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": f"{sf_dir}/events.parquet"},
                "filters": [
                    {
                        "type": "select",
                        "columns": ["event_id", "event_type", "value"],
                    }
                ],
                "out": {"type": "ltsv", "path": land},
            }
        ),
    )
    run_pipeline_streaming(
        spark,
        load_spec(
            {
                "in": {
                    "type": "ltsv",
                    "path": land,
                    "columns": [
                        {"name": "event_id", "type": "long"},
                        {"name": "event_type", "type": "string"},
                        {"name": "value", "type": "double"},
                    ],
                },
                "filters": [{"type": "filter", "predicate": "value > 10"}],
                "out": {"type": "parquet", "path": sinkdir},
            }
        ),
    )
    return (
        spark.read.parquet(sinkdir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))) / F.lit(100.0)
            ).alias("total"),
            F.max("event_id").alias("max_id"),
        )
    )


@register(
    "stream_dedup_events",
    oracle="""
    SELECT event_id, min(user_id) AS user_id, min(event_type) AS event_type
    FROM events GROUP BY event_id
    """,
    tags=("streaming", "dedup"),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup within the watermark horizon
    (dropDuplicatesWithinWatermark). Batch-equivalent oracle: availableNow
    over bounded input emits exactly one row per event_id, and duplicate
    event_ids in the testdata never diverge on the carried columns (asserted
    in tests), so min() per column reproduces the survivor deterministically
    — whichever physical row the stream kept."""
    from .streaming.ingest import (
        read_events_stream,
        run_stream_to_memory,
        streaming_dedup,
    )

    stream = streaming_dedup(read_events_stream(spark, sf_dir)).select(
        "event_id", "user_id", "event_type"
    )
    return run_stream_to_memory(stream, "stream_dedup_events", output_mode="append")


@register(
    "stream_sliding_enriched",
    oracle="""
    WITH seg AS (
      SELECT c_custkey AS user_id, c_mktsegment AS segment FROM customer
    ), e AS (
      SELECT ts, value, segment FROM events JOIN seg USING (user_id)
    ), x AS (
      -- width = 2 x slide: every event lands in exactly the 2 slide-aligned
      -- windows [floor30(ts) - i*1800, +1h), i in {0,1} - the same set
      -- Spark's F.window(ts, '1 hour', '30 minutes') assigns
      SELECT (CAST(floor(epoch(ts) / 1800) AS BIGINT) - i.i) * 1800
               AS window_start_sec,
             segment, value
      FROM e CROSS JOIN (SELECT unnest(range(2)) AS i) i
    )
    SELECT window_start_sec, segment, count(*) AS n_events,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
    FROM x GROUP BY 1, 2
    """,
    tags=("streaming", "join"),
)
def q_stream_sliding_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window (1h window / 30m slide) counts over the event stream
    enriched by a STATIC per-user segment dimension (stream-static broadcast
    join — no join state) — driven to completion with availableNow; the
    incremental result must equal the batch double-window expansion
    (oracle). Exact integer-cent sums make the result micro-batch-split
    invariant."""
    from .streaming.ingest import (
        read_events_stream,
        run_stream_to_memory,
        sliding_enriched_stream,
    )

    segments = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    stream = sliding_enriched_stream(read_events_stream(spark, sf_dir), segments)
    return run_stream_to_memory(
        stream, "stream_sliding_enriched", output_mode="complete"
    )


# ---------------------------------------------------------------------------
# Scalar function gauntlets (portable surface, functions/registry.py)
# ---------------------------------------------------------------------------


@register(
    "functions_string_gauntlet",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS u, lower(p_brand) AS lo,
           substr(p_name, 2, 5) AS sub,
           length(p_type)::INT AS le,
           replace(p_type, 'a', '@') AS rep,
           lpad(p_brand, 12, '_') AS pad,
           reverse(p_name) AS rev,
           concat_ws('/', p_brand, p_type) AS cw,
           md5(p_name) AS h
    FROM part
    """,
    tags=("functions",),
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.selectExpr(
        "p_partkey",
        "upper(p_name) AS u",
        "lower(p_brand) AS lo",
        "substring(p_name, 2, 5) AS sub",
        "length(p_type) AS le",
        "replace(p_type, 'a', '@') AS rep",
        "lpad(p_brand, 12, '_') AS pad",
        "reverse(p_name) AS rev",
        "concat_ws('/', p_brand, p_type) AS cw",
        "md5(p_name) AS h",
    )


@register(
    "functions_datetime_gauntlet",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)::INT AS y, month(o_orderdate)::INT AS m,
           day(o_orderdate)::INT AS d, hour(o_orderdate)::INT AS h,
           date_trunc('month', o_orderdate)::TIMESTAMP AS mon,
           epoch_us(o_orderdate) AS us
    FROM orders
    """,
    tags=("functions",),
)
def q_fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.selectExpr(
        "o_orderkey",
        "year(o_orderdate) AS y",
        "month(o_orderdate) AS m",
        "dayofmonth(o_orderdate) AS d",
        "hour(o_orderdate) AS h",
        "date_trunc('month', o_orderdate) AS mon",
        # o_orderdate arrives as TIMESTAMP_NTZ (parquet ms, not UTC-adjusted);
        # cast to LTZ under the UTC session for epoch extraction
        "unix_micros(cast(o_orderdate AS timestamp)) AS us",
    )


@register(
    "functions_math_gauntlet",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS a,
           ceil(l_quantity)::BIGINT AS ce, floor(l_extendedprice)::BIGINT AS fl,
           round(sqrt(l_quantity), 4) AS sq,
           round(ln(l_extendedprice), 4) AS lg,
           round(pow(l_discount, 2), 6) AS p2,
           sign(l_discount - 0.05)::DOUBLE AS sg,
           greatest(l_tax, l_discount) AS g, least(l_tax, l_discount) AS ls
    FROM lineitem
    """,
    tags=("functions",),
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "abs(l_discount - 0.05) AS a",
        "ceil(l_quantity) AS ce",
        "floor(l_extendedprice) AS fl",
        "round(sqrt(l_quantity), 4) AS sq",
        "round(ln(l_extendedprice), 4) AS lg",
        "round(pow(l_discount, 2), 6) AS p2",
        "sign(l_discount - 0.05) AS sg",
        "greatest(l_tax, l_discount) AS g",
        "least(l_tax, l_discount) AS ls",
    )


# ---------------------------------------------------------------------------
# More relational shapes: pivot, cube, exists, range join, global top-k, skew
# ---------------------------------------------------------------------------


@register(
    "pivot_linestatus",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("relational", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return out.select(
        "l_returnflag",
        F.col("O").alias("qty_O"),
        F.col("F").alias("qty_F"),
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("relational", "agg"),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


@register(
    "exists_big_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48
    )
    """,
    tags=("relational", "subquery"),
)
def q_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the SQL API (Catalyst rewrites to semi join)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM v_orders o
        WHERE EXISTS (
          SELECT 1 FROM v_lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 48
        )
        """
    )


@register(
    "range_join_value_tiers",
    oracle="""
    WITH tiers(tier, lo, hi) AS (
      VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 1e9)
    )
    SELECT t.tier, count(*) AS n,
           sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) / 100.0 AS total
    FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
    GROUP BY t.tier
    """,
    tags=("relational", "rangejoin"),
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join against a tiny tier table — broadcast nested
    loop on the broadcast side is the right plan at any scale (the big side
    streams once; no shuffle)."""
    ev = load(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1e9)],
        "tier string, lo double, hi double",
    )
    return (
        ev.join(
            F.broadcast(tiers),
            (ev.value >= tiers.lo) & (ev.value < tiers.hi),
        )
        .groupBy("tier")
        .agg(F.count("*").alias("n"), exact_sum(F.col("value")).alias("total"))
    )


@register(
    "global_topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    tags=("relational", "topk"),
)
def q_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans orderBy+limit as TakeOrderedAndProject —
    per-partition heaps + driver merge of k rows, never a full global sort."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "skew_salted_agg",
    oracle="""
    SELECT event_type, count(*) AS n,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total
    FROM events GROUP BY event_type
    """,
    tags=("relational", "skew"),
)
def q_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation for low-cardinality/skewed keys: partial
    agg on (key, salt) spreads the hot key over the cluster, final agg
    combines — same result as a plain groupBy (the oracle), ~Nx less skew.
    (For sums: count/sum recombine exactly; avg would need sum+count.)"""
    from .operators.partitioning import salt_expr

    ev = load(spark, sf_dir, "events").withColumn("__salt", salt_expr(16))
    partial = ev.groupBy("event_type", "__salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))).alias("pv"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"), (F.sum("pv") / F.lit(100.0)).alias("total")
    )


@register(
    "csv_engine_roundtrip",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem WHERE l_orderkey <= 1000 GROUP BY l_returnflag
    """,
    tags=("parity", "csv"),
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 parity through the engine itself: parquet → csv sink → csv source
    (declared schema, timestamp format) → aggregate. The oracle sees only the
    original table — so the round trip must be lossless."""

    from .plans.compiler import compile_pipeline, run_pipeline
    from .spec import load_spec

    outdir = scratch_dir("csv_rt_") + "/li"
    run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": f"{sf_dir}/lineitem.parquet"},
                "filters": [
                    {"type": "filter", "predicate": "l_orderkey <= 1000"},
                    {"type": "select", "columns": ["l_orderkey", "l_returnflag", "l_quantity", "l_shipdate"]},
                ],
                "out": {"type": "csv", "path": outdir, "options": {"header": False}},
            }
        ),
    )
    back = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "csv",
                    "path": outdir,
                    "columns": [
                        {"name": "l_orderkey", "type": "long"},
                        {"name": "l_returnflag", "type": "string"},
                        {"name": "l_quantity", "type": "double"},
                        {"name": "l_shipdate", "type": "timestamp"},
                    ],
                },
                "out": {"type": "null"},
            }
        ),
    )
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty")
    )


@register(
    "xml_engine_roundtrip",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS total,
           strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_date
    FROM orders WHERE o_orderkey <= 1000 GROUP BY o_orderpriority
    """,
    tags=("source", "xml"),
)
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sources/sinks beyond CSV (SURVEY §2.4): parquet → xml sink → xml
    source → aggregate, through the engine's own pipeline. Spark 4's native
    XML datasource (no external jar); the engine pins paired microsecond
    timestampFormat defaults and surrounding-whitespace fidelity
    (ignoreSurroundingSpaces off — the reader default trims values). The
    oracle sees only the original table, so the trip must be lossless."""

    from .plans.compiler import compile_pipeline, run_pipeline
    from .spec import load_spec

    outdir = scratch_dir("xml_rt_") + "/ord"
    run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": f"{sf_dir}/orders.parquet"},
                "filters": [
                    {"type": "filter", "predicate": "o_orderkey <= 1000"},
                    {"type": "select", "columns": ["o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate"]},
                    # the testdata's NTZ-encoded timestamps normalize to
                    # TimestampType so the xml writer's timestampFormat
                    # (not timestampNTZFormat) governs the trip
                    {"type": "cast", "mapping": {"o_orderdate": "timestamp"}},
                ],
                "out": {"type": "xml", "path": outdir},
            }
        ),
    )
    back = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "xml",
                    "path": outdir,
                    "columns": [
                        {"name": "o_orderkey", "type": "long"},
                        {"name": "o_orderpriority", "type": "string"},
                        {"name": "o_totalprice", "type": "double"},
                        {"name": "o_orderdate", "type": "timestamp"},
                    ],
                },
                "out": {"type": "null"},
            }
        ),
    )
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("max_date"),
    )


@register(
    "ltsv_engine_roundtrip",
    oracle="""
    SELECT event_type, count(*) AS n,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts,
           count(DISTINCT props) AS n_props
    FROM events GROUP BY event_type
    """,
    tags=("source", "ltsv"),
)
def q_ltsv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTSV parser/formatter pair (public embulk ecosystem plugins
    parser-ltsv / formatter-ltsv; engine analog in sources/lineparsers.py +
    sinks/writer.prepare_file_sink): parquet → ltsv sink → ltsv source →
    aggregate, through the engine's own pipeline. The props column carries
    json (colons, braces) so the first-colon label split is exercised; the
    oracle sees only the original table, so the trip must be lossless —
    doubles (Java shortest-roundtrip rendering), microsecond timestamps,
    and colon-laden strings included."""

    from .plans.compiler import compile_pipeline, run_pipeline
    from .spec import load_spec

    outdir = scratch_dir("ltsv_rt_") + "/ev"
    run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": f"{sf_dir}/events.parquet"},
                "filters": [
                    *events_ts_normalize_filters(sf_dir),
                    {
                        "type": "select",
                        "columns": [
                            "event_id", "ts", "event_type", "value", "props",
                        ],
                    },
                ],
                "out": {"type": "ltsv", "path": outdir},
            }
        ),
    )
    back = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "ltsv",
                    "path": outdir,
                    "columns": [
                        {"name": "event_id", "type": "long"},
                        {"name": "ts", "type": "timestamp"},
                        {"name": "event_type", "type": "string"},
                        {"name": "value", "type": "double"},
                        {"name": "props", "type": "string"},
                    ],
                },
                "out": {"type": "null"},
            }
        ),
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))) / F.lit(100.0)).alias(
            "total"
        ),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("max_ts"),
        F.countDistinct("props").alias("n_props"),
    )


@register(
    "regex_parse_logs",
    oracle="""
    SELECT event_type, count(*) AS n,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total,
           max(user_id) AS max_user
    FROM events GROUP BY event_type
    """,
    tags=("source", "regex"),
)
def q_regex_parse_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-group regex parser (embulk-parser-regex analog): the engine
    renders events as classic log lines (`<id> [<type>] user=<id>
    cents=<n>`) through the text sink, then parses them back via the regex
    source — one capture group per declared column, typed casts, line-level
    match gate. The parse is regexp_extract/regexp_like only (JVM, codegen);
    the oracle replays the aggregate on the original table, so format →
    parse must be lossless. Integer cents round-trip the double exactly
    (floor half-up scaling — same discipline as the float-agg oracles)."""

    from .plans.compiler import compile_pipeline, run_pipeline
    from .spec import load_spec

    outdir = scratch_dir("regex_rt_") + "/logs"
    run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": f"{sf_dir}/events.parquet"},
                "filters": [
                    {
                        "type": "with_column",
                        "name": "line",
                        "expr": (
                            "format_string('%d [%s] user=%d cents=%d', "
                            "event_id, event_type, user_id, "
                            "cast(floor(value * 100 + 0.5) as bigint))"
                        ),
                    },
                    {"type": "select", "columns": ["line"]},
                    {"type": "rename", "mapping": {"line": "value"}},
                ],
                "out": {"type": "text", "path": outdir},
            }
        ),
    )
    back = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "regex",
                    "path": outdir,
                    "options": {
                        "pattern": (
                            r"^(\d+) \[(\w+)\] user=(\d+) cents=(-?\d+)$"
                        )
                    },
                    "columns": [
                        {"name": "event_id", "type": "long"},
                        {"name": "event_type", "type": "string"},
                        {"name": "user_id", "type": "long"},
                        {"name": "cents", "type": "long"},
                    ],
                },
                "out": {"type": "null"},
            }
        ),
    )
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (F.sum("cents") / F.lit(100.0)).alias("total"),
        F.max("user_id").alias("max_user"),
    )


@register(
    "schema_guess_roundtrip",
    oracle="""
    SELECT * FROM (VALUES
      ('event_id',   'long',      1),
      ('ts',         'timestamp', 2),
      ('event_type', 'string',    3),
      ('value',      'double',    4),
      ('flag',       'boolean',   5),
      ('day',        'date',      6),
      ('props',      'string',    7)
    ) AS t(col_name, col_type, pos)
    """,
    tags=("source", "guess"),
)
def q_schema_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``embulk guess`` analog (sources/guess.py): the engine renders events
    to headered csv TEXT (longs, microsecond timestamps, doubles, booleans,
    dates, json strings), then infers the ``columns:`` block back from the
    raw strings — one fused try_cast counting aggregate over a bounded
    sample. The oracle is the GROUND TRUTH: inference must recover the
    original schema exactly, most-specific type per column. The guessed
    schema is what ``options: {guess: true}`` feeds the csv source."""
    from .sources.guess import guess_csv_schema
    from .plans.compiler import run_pipeline
    from .spec import load_spec

    outdir = scratch_dir("guess_rt_") + "/ev"
    run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": f"{sf_dir}/events.parquet"},
                "filters": [
                    *events_ts_normalize_filters(sf_dir),
                    {
                        "type": "with_column",
                        "name": "flag",
                        "expr": "value > 50.0",
                    },
                    {"type": "with_column", "name": "day", "expr": "to_date(ts)"},
                    {
                        "type": "select",
                        "columns": [
                            "event_id", "ts", "event_type", "value",
                            "flag", "day", "props",
                        ],
                    },
                ],
                "out": {"type": "csv", "path": outdir},
            }
        ),
    )
    cols = guess_csv_schema(spark, outdir, {"header": True})
    return spark.createDataFrame(
        [(c.name, c.type, i + 1) for i, c in enumerate(cols)],
        "col_name string, col_type string, pos int",
    )


@register(
    "task_source_generate",
    oracle="""
    SELECT t.task_index, g.i,
           t.task_index * 1000 + g.i AS gen_id
    FROM (SELECT unnest(range(4)) AS task_index) t,
         (SELECT unnest(range(100)) AS i) g
    """,
    tags=("parity", "source"),
)
def q_task_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plugin-style source (O1's non-file path): N parallel input tasks drive
    a registered reader fn via mapInPandas — one Spark partition per task,
    like the reference's one-split-per-task-index (EmbulkInputSplit)."""
    import pandas as pd

    from .sources.readers import register_task_source
    from .plans.compiler import compile_pipeline
    from .spec import load_spec

    def gen(task_index: int):
        yield pd.DataFrame(
            {
                "task_index": task_index,
                "i": range(100),
                "gen_id": [task_index * 1000 + i for i in range(100)],
            }
        )

    register_task_source("gen100", gen)
    return compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "task",
                    "task_count": 4,
                    "options": {"task_fn": "gen100"},
                    "columns": [
                        {"name": "task_index", "type": "long"},
                        {"name": "i", "type": "long"},
                        {"name": "gen_id", "type": "long"},
                    ],
                },
                "out": {"type": "null"},
            }
        ),
    )


# ---------------------------------------------------------------------------
# Outer joins, statistical aggs, window functions, grouping sets
# ---------------------------------------------------------------------------


@register(
    "outer_join_customer_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders,
           coalesce(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)), 0) / 100.0 AS spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("relational", "join"),
)
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            (
                F.coalesce(
                    F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))), F.lit(0)
                )
                / F.lit(100.0)
            ).alias("spend"),
        )
    )


@register(
    "distinct_aggs",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("relational", "agg"),
)
def q_distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) — Catalyst plans the expand+two-phase agg."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@register(
    "stats_aggs",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             o_totalprice
      FROM orders
    )
    SELECT o_orderpriority,
           floor(sqrt((count(*) * sum(cents * cents) - sum(cents) * sum(cents))::DOUBLE
                      / (count(*) * (count(*) - 1))::DOUBLE / 10000.0) * 10000 + 0.5) / 10000.0 AS sd,
           floor(((count(*) * sum(cents * cents) - sum(cents) * sum(cents))::DOUBLE
                  / (count(*) * (count(*) - 1))::DOUBLE / 10000.0) * 10000 + 0.5) / 10000.0 AS vr,
           floor(min(o_totalprice) * 100 + 0.5) / 100.0 AS mn,
           floor(max(o_totalprice) * 100 + 0.5) / 100.0 AS mx
    FROM c GROUP BY o_orderpriority
    """,
    tags=("relational", "agg"),
)
def q_stats_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev from EXACT integer moments: n·Σc² − (Σc)² is
    computed in decimal(38,0) (Spark) / HUGEINT (DuckDB) — the same integer in
    both engines — then one identical chain of double ops. stddev_samp() of
    doubles is partial-aggregation-order dependent and not portable."""
    o = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
    cd = cents.cast("decimal(38,0)")
    n = F.count(F.lit(1))
    num = (n * F.sum(cd * cd) - F.sum(cd) * F.sum(cd)).cast("double")
    den = (n * (n - F.lit(1))).cast("double")
    var_raw = num / den / F.lit(10000.0)
    return o.groupBy("o_orderpriority").agg(
        d_round(F.sqrt(var_raw), 4).alias("sd"),
        d_round(var_raw, 4).alias("vr"),
        d_round(F.min("o_totalprice"), 2).alias("mn"),
        d_round(F.max("o_totalprice"), 2).alias("mx"),
    )


@register(
    "window_lag_lead_rank",
    oracle="""
    SELECT event_id, user_id,
           lag(event_id) OVER w AS prev_event,
           lead(event_id) OVER w AS next_event,
           rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id)::INT AS value_rank,
           ntile(4) OVER w::INT AS quartile
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("relational", "window"),
)
def q_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wv = W.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.rank().over(wv).alias("value_rank"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("relational", "agg"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM v_li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "levenshtein_near_names",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_name,
             p_brand || '|' || CAST(length(p_name) // 8 AS VARCHAR)
                     || '|' || substr(p_name, 1, 1) AS blk
      FROM part
    )
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           levenshtein(a.p_name, b.p_name)::INT AS dist
    FROM p a JOIN p b
      ON a.blk = b.blk AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 12
    """,
    tags=("dedup", "text"),
)
def q_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pass with a COMPOSED blocking key:
    brand × name-length band (width 8) × first character. Brand alone has ~25
    distinct values, so pairs grow O(n²/25) with the corpus — dead at 100×
    scale (80k pairs at sf0.1 already). The composed key multiplies block
    cardinality by ~width·alphabet, keeping per-block pair counts bounded;
    the usual blocking recall trade-off (a pair split across blocks is
    skipped) is mirrored exactly in the oracle."""
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.concat_ws(
            "|",
            F.col("p_brand"),
            F.floor(F.length("p_name") / 8).cast("int"),
            F.substring("p_name", 1, 1),
        ).alias("blk"),
    )
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("dist"),
        )
        .filter(F.col("dist") <= 12)
    )


@register(
    "embedding_centroids",
    oracle="""
    SELECT label, u.dim::INT AS dim,
           floor(((sum(CAST(floor(u.x * 100000000 + 0.5) AS BIGINT)) / 100000000.0)
                  / count(*)) * 10000 + 0.5) / 10000.0 AS centroid
    FROM (
      SELECT label,
             unnest(list_transform(range(1, len(embedding) + 1),
                                   i -> {'dim': i - 1, 'x': embedding[i]::DOUBLE})) AS u
      FROM embeddings
    )
    GROUP BY label, u.dim
    """,
    tags=("similarity", "vector"),
)
def q_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise centroid per label: posexplode + groupBy — the shuffle
    key is (label, dim) so 100 TB of vectors aggregates without ever
    materializing per-label vector lists."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode(F.col("embedding")).alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            exact_avg(F.col("x").cast("double"), scale=100000000, digits=4).alias(
                "centroid"
            )
        )
    )


@register(
    "zscore_per_user",
    oracle="""
    SELECT event_id, user_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 4) AS z
    FROM events
    """,
    tags=("relational", "pandas-udf"),
)
def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the reference's plugin-filter analog, O3):
    per-user z-score computed in pandas per group, Arrow-batched. Oracle is
    the pure-SQL window formulation — both must agree to 4 decimals."""
    import pandas as pd

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["value"].std(ddof=1)
        pdf["z"] = ((pdf["value"] - pdf["value"].mean()) / sd).round(4)
        return pdf[["event_id", "user_id", "z"]]

    return ev.groupBy("user_id").applyInPandas(
        zscore, schema="event_id long, user_id long, z double"
    )


# ---------------------------------------------------------------------------
# Embedding near-dup, BPE-ish token counting, multimodal resize/frame-sample,
# JSONL engine round-trip, array gauntlet, correlated scalar subquery,
# custom stateful streaming
# ---------------------------------------------------------------------------


@register(
    "embedding_neardup",
    oracle="""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             concat(CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END,
                    CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END) AS bucket
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           floor((list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
                 ) * 10000 + 0.5) / 10000.0 AS cos_sim
    FROM base a JOIN base b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE floor((list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
                ) * 10000 + 0.5) / 10000.0 >= 0.25
    """,
    tags=("dedup", "similarity", "vector"),
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: sign-bit LSH blocking + exact cosine within
    bucket — the self-join shuffles on the bucket key, never O(n²) across the
    corpus. The catalog pins sign_dims=6 so the static oracle can mirror the
    bucket key; the operator itself auto-sizes sign_dims from a corpus count
    (operators/dedup.neardup_sign_dims) when not pinned."""
    from .operators.dedup import embedding_neardup

    return embedding_neardup(load(spark, sf_dir, "embeddings"), sign_dims=6)


from .operators.similarity import semantic_dedup_oracle_sql  # noqa: E402


@register(
    "semantic_dedup_embeddings",
    oracle=semantic_dedup_oracle_sql(k=16, iters=2, threshold_micro=250_000),
    tags=("dedup", "similarity", "kmeans", "vector"),
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: k-means-cluster the embeddings
    (deterministic Lloyd's trainer), then first-wins cosine dedup WITHIN
    each cluster — clustering bounds the quadratic compare per cluster the
    way MinHash bands bound lexical near-dup, the standard recipe for
    semantic dedup over pretraining corpora. Exactmath end to end (scaled-
    integer centroid means, micro-unit integer threshold), so the oracle
    unrolls the training AND replays the dedup bit-exactly."""
    from .operators.dedup import semantic_dedup

    # k=None → corpus-sized via semantic_dedup_k (the 100 TB contract). The
    # static oracle is unrolled at k=16, which is exactly what the auto
    # sizing resolves to at every test SF (≤16·1024 embeddings) — the pin is
    # guarded by tests/test_scale_guards.py::test_semantic_dedup_oracle_k_pin
    # so testdata growth can never silently diverge query from oracle.
    return semantic_dedup(
        load(spark, sf_dir, "embeddings"), k=None, iters=2, threshold_micro=250_000
    )


from .operators.similarity import semantic_dedup_two_level_oracle_sql  # noqa: E402


@register(
    "semantic_dedup_two_level",
    oracle=semantic_dedup_two_level_oracle_sql(
        coarse_k=4, sub_k=4, iters=2, threshold_micro=250_000
    ),
    tags=("dedup", "similarity", "kmeans", "vector"),
)
def q_semantic_dedup_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level SemDeDup (r5): coarse k-means cells, then per-cell
    sub-clusterings trained in one grouped pass (the PQ-codebook machinery),
    first-wins cosine dedup within each (cell, sub) leaf. This is the
    construction for the regime past flat-k's 65536 broadcast cap — √-scale
    centroid tables per level, 65536² addressable leaves. Exactmath end to
    end: the oracle unrolls BOTH training levels (coarse chain + grouped
    sub-chain with row_number-per-cell init) and replays the leaf dedup
    bit-exactly. Explicit 4×4 here (deeper tree than the corpus-sized
    default would pick at test SF) to exercise multi-cell × multi-sub
    interactions under the driver gate."""
    from .operators.dedup import semantic_dedup_two_level

    return semantic_dedup_two_level(
        load(spark, sf_dir, "embeddings"),
        coarse_k=4,
        sub_k=4,
        iters=2,
        threshold_micro=250_000,
    )


from .operators.similarity import incremental_semantic_oracle_sql  # noqa: E402


@register(
    "semantic_dedup_incremental_state",
    oracle=incremental_semantic_oracle_sql(k=8, iters=2, threshold_micro=250_000),
    tags=("dedup", "incremental", "similarity", "sink"),
)
def q_semantic_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup through REAL persisted state (r5) — the
    semantic sibling of ``dedup_incremental_state``: increment 1 (even
    vec_ids) trains the centroid table (persisted to parquet) and seeds the
    survivor state through the pointer-committed merge sink; increment 2
    (odd vec_ids) assigns AGAINST THE STORED CENTROIDS (assign-only, no
    retrain — stable cell ids are what make the state joinable) and dedups
    against both itself and the committed state, whose delta merges back
    bucket-pruned. The oracle replays both increments — unrolled batch-1
    k-means, both cosine assignments, within-batch and vs-state first-wins
    drops — so the hash pins the operator AND the sink round-trip (centroid
    parquet + merge manifest) together."""

    from .operators.dedup import incremental_semantic_dedup
    from .sinks.writer import read_merge_state, write_sink
    from .spec import SinkSpec

    emb = load(spark, sf_dir, "embeddings")
    root = scratch_dir("q_sem_incr_")
    cent_path = f"{root}/centroids"
    state_path = f"{root}/state"
    sink = SinkSpec(
        type="parquet",
        path=state_path,
        mode="merge",
        merge_key=("vec_id", "cell"),
        merge_order=("nrm",),
    )
    kw = dict(k=8, iters=2, threshold_micro=250_000)
    _, d1, trained = incremental_semantic_dedup(
        emb.filter(F.col("vec_id") % 2 == 0), None, None, **kw
    )
    trained.write.parquet(cent_path)
    write_sink(d1, sink)
    _, d2, _ = incremental_semantic_dedup(
        emb.filter(F.col("vec_id") % 2 == 1),
        read_merge_state(spark, state_path),
        spark.read.parquet(cent_path),
        **kw,
    )
    write_sink(d2, sink)
    return read_merge_state(spark, state_path).select("cell", "vec_id")


from .operators.similarity import incremental_semantic_two_level_oracle_sql  # noqa: E402


@register(
    "semantic_dedup_two_level_incremental_state",
    oracle=incremental_semantic_two_level_oracle_sql(
        coarse_k=3, sub_k=3, iters=2, threshold_micro=250_000
    ),
    tags=("dedup", "incremental", "similarity", "sink", "two-level"),
)
def q_semantic_dedup_two_level_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-level incremental SemDeDup through REAL persisted state (r6,
    VERDICT r5 item 3) — the √k×√k composition of
    ``semantic_dedup_two_level`` and ``semantic_dedup_incremental_state``:
    increment 1 (even vec_ids) trains BOTH centroid levels (coarse
    row_number-init chain + grouped per-cell sub-chain, both persisted to
    parquet) and seeds the survivor state through the pointer-committed
    merge sink; increment 2 (odd vec_ids) assigns against the STORED PAIR
    (two broadcast joins, zero k-means jobs — the assign-only steady state,
    plan-guarded) and dedups on the LEAF key (cell, scid) against itself
    and the committed state, whose delta merges back bucket-pruned. The
    oracle replays both increments — unrolled two-level training, all four
    assignments, within-leaf and vs-state first-wins drops — pinning the
    operator AND the sink round-trip together."""

    from .operators.dedup import incremental_semantic_dedup_two_level
    from .sinks.writer import read_merge_state, write_sink
    from .spec import SinkSpec

    emb = load(spark, sf_dir, "embeddings")
    root = scratch_dir("q_sem2l_incr_")
    sink = SinkSpec(
        type="parquet",
        path=f"{root}/state",
        mode="merge",
        merge_key=("vec_id", "cell"),
        merge_order=("nrm",),
    )
    kw = dict(coarse_k=3, sub_k=3, iters=2, threshold_micro=250_000)
    _, d1, trained = incremental_semantic_dedup_two_level(
        emb.filter(F.col("vec_id") % 2 == 0), None, None, **kw
    )
    trained[0].write.parquet(f"{root}/coarse")
    trained[1].write.parquet(f"{root}/sub")
    write_sink(d1, sink)
    _, d2, _ = incremental_semantic_dedup_two_level(
        emb.filter(F.col("vec_id") % 2 == 1),
        read_merge_state(spark, f"{root}/state"),
        (
            spark.read.parquet(f"{root}/coarse"),
            spark.read.parquet(f"{root}/sub"),
        ),
        **kw,
    )
    write_sink(d2, sink)
    return read_merge_state(spark, f"{root}/state").select("cell", "scid", "vec_id")


@register(
    "stream_cdc_semantic_ingest",
    oracle=incremental_semantic_two_level_oracle_sql(
        coarse_k=3, sub_k=3, iters=2, threshold_micro=250_000
    ),
    tags=("streaming", "cdc", "dedup", "incremental", "similarity", "sink"),
)
def q_stream_cdc_semantic_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC tail × semantic dedup COMPOSITION driver-verified end to end
    (r13, VERDICT r12 item 4): an upstream embeddings merge table commits
    three versions (v0 empty bootstrap, v1 = even vec_ids, v2 = odd),
    and ``run_cdc_semantic_ingest`` tails its change feed — per-version
    ``table_changes`` increments, insert/update_postimage rows only,
    commit version as the exactly-once claim — through the two-level
    incremental semantic dedup sink (centroids trained on the FIRST
    delivered increment, assign-only after; survivors merged bucket-pruned;
    checkpoint advanced per version). The oracle is the SAME two-increment
    replay that pins ``semantic_dedup_two_level_incremental_state``: the
    composition must be value-invisible — routing the batches through the
    real change feed + version-tail + claim machinery changes NOTHING
    about the corpus the pipeline keeps. Retry interleavings are pinned in
    tests/test_cdc_semantic_compose.py."""

    from .sinks.writer import read_merge_state, write_sink
    from .spec import SinkSpec
    from .streaming.ingest import run_cdc_semantic_ingest

    emb = load(spark, sf_dir, "embeddings")
    root = scratch_dir("q_cdc_sem_")
    up = f"{root}/upstream"
    sink = SinkSpec(
        type="parquet",
        path=up,
        mode="merge",
        merge_key=("vec_id",),
        merge_order=("rev",),
        merge_keep_versions=4,
    )
    write_sink(emb.limit(0).withColumn("rev", F.lit(0)), sink)
    write_sink(
        emb.filter(F.col("vec_id") % 2 == 0).withColumn("rev", F.lit(1)), sink
    )
    write_sink(
        emb.filter(F.col("vec_id") % 2 == 1).withColumn("rev", F.lit(2)), sink
    )
    run_cdc_semantic_ingest(
        spark,
        up,
        ["vec_id"],
        f"{root}/state",
        f"{root}/corpus",
        f"{root}/cents",
        checkpoint=f"{root}/ckpt",
        coarse_k=3,
        sub_k=3,
        iters=2,
        threshold_micro=250_000,
    )
    return read_merge_state(spark, f"{root}/state").select(
        "cell", "scid", "vec_id"
    )


@register(
    "dup_span_scrub",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), tokpos AS (
      SELECT doc_id, u.i AS tpos, w[u.i + 1] AS tok
      FROM d, unnest(range(len(w))) u(i)
    ), wins AS (
      SELECT doc_id, u.i AS pos,
             md5(array_to_string(w[u.i + 1 : u.i + 5], ' ')) AS wh
      FROM d, unnest(range(greatest(len(w) - 4, 0))) u(i)
    ), r AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY wh ORDER BY doc_id, pos) AS rn,
             count(*) OVER (PARTITION BY wh) AS n_occ
      FROM wins
    ), dup AS (
      SELECT doc_id, pos FROM r WHERE n_occ > 1 AND rn > 1
    ), covered AS (
      SELECT DISTINCT doc_id, pos + v.i AS tpos
      FROM dup, unnest(range(5)) v(i)
    ), kept AS (
      SELECT t.doc_id, t.tpos, t.tok
      FROM tokpos t ANTI JOIN covered c
        ON t.doc_id = c.doc_id AND t.tpos = c.tpos
    ), tot AS (
      SELECT doc_id, len(w) AS n_total FROM d
    )
    SELECT k.doc_id,
           string_agg(k.tok, ' ' ORDER BY k.tpos) AS clean_text,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(any_value(tot.n_total) - count(*) AS BIGINT) AS n_dropped
    FROM kept k JOIN tot ON k.doc_id = tot.doc_id
    GROUP BY k.doc_id
    """,
    tags=("text", "dedup", "llm-prep"),
)
def q_dup_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-span scrubbing (r6): every OVERLAPPING
    5-token window is hashed corpus-wide, only the global-first occurrence
    of a repeated window keeps its tokens, overlapping duplicate spans
    merge, and documents are rebuilt from surviving tokens — duplicated
    passages are caught at ARBITRARY alignment, the property fixed
    non-overlapping chunks (line_dedup_c4) cannot provide. Full value-hash
    oracle: the DuckDB mirror replays windowing, global argmin, coverage
    expansion, and ordered reassembly."""
    from .operators.text import duplicate_span_scrub

    return duplicate_span_scrub(
        load(spark, sf_dir, "documents"), window_words=5
    )


from .operators.text import bpe_oracle_sql  # noqa: E402


@register(
    "bpe_train_merges",
    oracle=bpe_oracle_sql(table="documents", n_merges=8),
    tags=("text", "tokenizer", "llm-prep"),
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BPE tokenizer training (r6): the corpus collapses to its
    word-frequency table in one pass, then 8 deterministic merge
    iterations run entirely over that bounded table — weighted adjacent
    pair counts (map-side combinable), a 1-row (cnt DESC, pair ASC)
    argmax, and a left-to-right re-segmentation per round. r17: up to
    65 536 distinct words the merge loop runs ON THE DRIVER over the
    collected word table (``operators.bpe_local`` — the textbook
    in-memory trainer every production tokenizer uses, bit-equal to the
    distributed loop and pinned so in tests); past the cap the
    fixed-iteration distributed loop runs unchanged on the same
    materialized table. Returns the learned merge table, the artifact a
    tokenizer ships. Full value-hash oracle: the DuckDB mirror unrolls
    all 8 merges."""
    from .operators.bpe_local import bpe_train

    return bpe_train(load(spark, sf_dir, "documents"), n_merges=8)


@register(
    "lm_bigram_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), pairs AS (
      SELECT doc_id, t[u.i + 1] AS w1, t[u.i + 2] AS w2
      FROM toks, unnest(range(greatest(len(t) - 1, 0))) u(i)
    ), c2 AS (
      SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY w1, w2
    ), c1 AS (
      SELECT w AS w1, count(*) AS c1 FROM (
        SELECT unnest(t) AS w FROM toks
      ) GROUP BY w
    ), v AS (SELECT count(*) AS v FROM c1)
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           floor(sum(CAST(floor((c2.c2 + 1) * 1000000 / (c1.c1 + v.v) + 0.5)
                          AS BIGINT))
                 / (1000000.0 * count(*)) * 1000000 + 0.5) / 1000000
             AS lm_score
    FROM pairs p
    JOIN c2 USING (w1, w2)
    JOIN c1 USING (w1)
    CROSS JOIN v
    GROUP BY p.doc_id
    """,
    tags=("text", "quality", "llm-prep"),
)
def q_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-trained bigram LM quality scoring (r6): one pass
    trains Laplace-smoothed transition counts, each doc scores the exact
    micro-unit arithmetic mean of its transition probabilities — the cheap
    statistical stand-in for the KenLM perplexity filter, in rational math
    so the whole model+scoring pipeline carries a full value-hash oracle
    (a log-domain score would hinge on cross-engine libm agreement)."""
    from .operators.text import lm_bigram_score

    return lm_bigram_score(load(spark, sf_dir, "documents"))


from .operators.text import bpe_segment_oracle_sql  # noqa: E402


@register(
    "bpe_segment_corpus",
    oracle=bpe_segment_oracle_sql(table="documents", n_merges=8),
    tags=("text", "tokenizer", "llm-prep"),
)
def q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of the BPE tokenizer (r6): train the 8-merge vocab
    (same deterministic loop as ``bpe_train_merges``), then tokenize the
    corpus under it — one corpus-token-sized equi-join against the
    vocabulary-sized segmentation table, yielding per-doc word and
    BPE-token counts (the packing/budgeting numbers a training pipeline
    needs under a real tokenizer). r17: the trainer dispatches through
    ``operators.bpe_local`` (driver-local merge loop under the 65 536-word
    cap, distributed loop unchanged past it); the apply join is verbatim.
    Full value-hash oracle: the chain plus the per-doc join replays in
    DuckDB."""
    from .operators.bpe_local import bpe_segment

    return bpe_segment(load(spark, sf_dir, "documents"), n_merges=8)


@register(
    "token_count_bpe",
    oracle=r"""
    SELECT doc_id,
           len(string_split(text, ' '))::INT AS n_words,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::INT
             AS n_bpeish_tokens,
           len(list_distinct(
             regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))::INT
             AS n_unique_tokens
    FROM documents
    """,
    tags=("text",),
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace words + BPE-ish regex pre-tokenization
    (letter runs / digit runs / single symbols) — all JVM-side regex."""
    from .operators.text import token_counts

    return token_counts(load(spark, sf_dir, "documents"))


@register(
    "multimodal_resize",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             1 + octet_length(encode(text)) % 1024 AS w,
             1 + octet_length(encode(text)) % 768 AS h
      FROM documents
    )
    SELECT doc_id, w::INT AS width, h::INT AS height,
           (w * 256 // greatest(w, h))::INT AS out_width,
           (h * 256 // greatest(w, h))::INT AS out_height
    FROM dims
    """,
    tags=("multimodal",),
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize plumbing (mapInPandas stub; integer math so
    the fake decoder is oracle-portable)."""
    from .operators.multimodal import resize_stub, to_binary

    return resize_stub(to_binary(load(spark, sf_dir, "documents")))


@register(
    "multimodal_frames",
    oracle="""
    SELECT d.doc_id,
           CAST(1 + octet_length(encode(d.text)) % 240 AS INT) AS n_frames,
           CAST(t.u AS INT) AS frame_idx,
           md5(md5(d.text) || '|' || t.u) AS frame_hash
    FROM documents d,
         unnest(range(0, 1 + octet_length(encode(d.text)) % 240, 24)) t(u)
    """,
    tags=("multimodal",),
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: binary payload fans out to one row per
    sampled frame (rows-out != rows-in through mapInPandas)."""
    from .operators.multimodal import frame_sample_stub, to_binary

    return frame_sample_stub(to_binary(load(spark, sf_dir, "documents")))


@register(
    "jsonl_engine_roundtrip",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0 AS total
    FROM orders WHERE o_orderkey <= 2000 GROUP BY o_orderstatus
    """,
    tags=("parity", "json", "source"),
)
def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink → source round trip through the engine (declared
    schema on read, like the reference's config-declared columns). The
    oracle sees only the original table, so the trip must be lossless."""

    from .plans.compiler import compile_pipeline, run_pipeline
    from .spec import load_spec

    outdir = scratch_dir("jsonl_rt_") + "/orders"
    run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": f"{sf_dir}/orders.parquet"},
                "filters": [
                    {"type": "filter", "predicate": "o_orderkey <= 2000"},
                    {"type": "select", "columns": ["o_orderkey", "o_orderstatus", "o_totalprice"]},
                ],
                "out": {"type": "json", "path": outdir},
            }
        ),
    )
    back = compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "json",
                    "path": outdir,
                    "columns": [
                        {"name": "o_orderkey", "type": "long"},
                        {"name": "o_orderstatus", "type": "string"},
                        {"name": "o_totalprice", "type": "double"},
                    ],
                },
                "out": {"type": "null"},
            }
        ),
    )
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), exact_sum(F.col("o_totalprice")).alias("total")
    )


@register(
    "functions_array_gauntlet",
    oracle="""
    SELECT vec_id,
           len(embedding)::INT AS n,
           floor(embedding[1]::DOUBLE * 10000 + 0.5) / 10000.0 AS first_elem,
           floor(embedding[-1]::DOUBLE * 10000 + 0.5) / 10000.0 AS last_elem,
           floor(list_min(embedding)::DOUBLE * 10000 + 0.5) / 10000.0 AS mn,
           floor(list_max(embedding)::DOUBLE * 10000 + 0.5) / 10000.0 AS mx,
           len(list_filter(embedding, x -> x > 0))::INT AS n_pos,
           floor(list_dot_product(embedding[1:8]::DOUBLE[],
                                  embedding[9:16]::DOUBLE[]) * 10000 + 0.5) / 10000.0 AS dot88
    FROM embeddings
    """,
    tags=("functions", "array"),
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/lambda function surface: size, element_at, min/max, filter,
    slice, zip_with + sequential-fold dot — all codegen'd JVM expressions."""
    from .operators.similarity import dot

    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("n"),
        d_round(emb[0].cast("double"), 4).alias("first_elem"),
        d_round(F.element_at(emb, -1).cast("double"), 4).alias("last_elem"),
        d_round(F.array_min(emb).cast("double"), 4).alias("mn"),
        d_round(F.array_max(emb).cast("double"), 4).alias("mx"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        d_round(
            dot(
                F.transform(F.slice(emb, 1, 8), lambda x: x.cast("double")),
                F.transform(F.slice(emb, 9, 8), lambda x: x.cast("double")),
            ),
            4,
        ).alias("dot88"),
    )


@register(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
      SELECT avg(o2.o_totalprice) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    """,
    tags=("relational", "subquery"),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Catalyst rewrites to an aggregate + join;
    no per-row re-execution)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_ss")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_totalprice
        FROM v_orders_ss o
        WHERE o.o_totalprice > 1.5 * (
          SELECT avg(o2.o_totalprice) FROM v_orders_ss o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@register(
    "stream_user_rollup",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             / 100.0 AS total_value
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def q_stream_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running rollups in the state store, accumulated in exact integer cents.
    Update mode re-emits a user's rollup every micro-batch; the final state
    per user (max event count — monotone) must equal the batch groupBy, which
    the DuckDB oracle checks hash-exactly. The state-store mechanics are
    additionally covered in tests/test_streaming_reports.py."""
    from .streaming.ingest import (
        read_events_stream,
        run_stream_to_memory,
        stateful_user_rollup,
    )

    stream = stateful_user_rollup(read_events_stream(spark, sf_dir))
    out = run_stream_to_memory(stream, "stream_user_rollup", output_mode="update")
    final = out.groupBy("user_id").agg(
        F.max(F.struct(F.col("n_events"), F.col("total_value"))).alias("m")
    )
    return final.select(
        "user_id", F.col("m.n_events").alias("n_events"),
        F.col("m.total_value").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# IVF ANN, window frames, null/conditional gauntlets, hash sampling,
# ORC round-trip, time-series gap-fill, bag set-ops
# ---------------------------------------------------------------------------


@register(
    "ann_ivf_topk",
    oracle="""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cents AS (
      SELECT vec_id AS cid, v AS cv FROM base WHERE vec_id < 64
    ), sims AS (
      SELECT b.vec_id, b.v, c.cid,
             floor((list_dot_product(b.v, c.cv)
                   / (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(c.cv, c.cv)))
                   ) * 1000000 + 0.5) / 1000000.0 AS csim
      FROM base b, cents c
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY csim DESC, cid) AS rn
      FROM sims
    ), lists AS (
      SELECT vec_id AS cand_id, v AS cv2, cid FROM ranked WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, v AS qv, cid FROM ranked
      WHERE vec_id IN (0, 1, 2, 3) AND rn <= 2
    ), scored AS (
      SELECT DISTINCT p.query_id, l.cand_id,
             floor((list_dot_product(p.qv, l.cv2)
                   / (sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(l.cv2, l.cv2)))
                   ) * 1000000 + 0.5) / 1000000.0 AS cos_sim
      FROM lists l JOIN probes p ON l.cid = p.cid
      WHERE l.cand_id <> p.query_id
    )
    SELECT query_id, cand_id, cos_sim FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
    tags=("similarity", "ivf"),
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN: coarse-quantize to a FIXED-k (64) centroid table,
    probe the 2 nearest lists per query — the scale path between brute force
    and LSH. The centroid broadcast is corpus-size-independent."""
    from .operators.similarity import ivf_topk

    return ivf_topk(load(spark, sf_dir, "embeddings"), n_centroids=64)


@register(
    "window_frames_gauntlet",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
           nth_value(o_orderkey, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key,
           floor((percent_rank() OVER w) * 1000000 + 0.5) / 1000000.0 AS pr,
           floor((cume_dist() OVER w) * 1000000 + 0.5) / 1000000.0 AS cd,
           floor((avg(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)) * 10000 + 0.5) / 10000.0 AS moving_avg_cents,
           CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS BIGINT) AS range_sum_cents
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("relational", "window"),
)
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame surface: first/last/nth_value with explicit full frames,
    percent_rank/cume_dist, rows-frame moving average, numeric RANGE frame.

    Moving aggregates run over exact integer cents: DuckDB evaluates windowed
    sums with segment trees (tree-order combination) while Spark folds
    sequentially, so double aggregation can differ in the last ulp and flip a
    rounded boundary — integer sums are order-free."""
    o = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    w_move = w.rowsBetween(-1, 1)
    w_range = (
        W.partitionBy("o_custkey").orderBy("o_orderkey").rangeBetween(-100, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("second_key"),
        d_round(F.percent_rank().over(w), 6).alias("pr"),
        d_round(F.cume_dist().over(w), 6).alias("cd"),
        d_round(F.avg(cents).over(w_move), 4).alias("moving_avg_cents"),
        F.sum(cents).over(w_range).alias("range_sum_cents"),
    )


@register(
    "null_scalar_gauntlet",
    oracle="""
    SELECT event_id,
           coalesce(nullif(event_type, 'click'), 'other') AS et,
           CASE WHEN value > 100 THEN 'hi' WHEN value > 50 THEN 'mid'
                ELSE 'lo' END AS tier,
           (json_extract_string(props, '$.missing') IS NULL) AS miss_is_null,
           coalesce(json_extract_string(props, '$.missing'), 'dflt') AS filled,
           least(coalesce(value, 0.0), 100.0) AS capped
    FROM events
    """,
    tags=("functions", "null"),
)
def q_null_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling scalar surface: nullif/coalesce/CASE/IS NULL."""
    ev = load(spark, sf_dir, "events")
    return ev.selectExpr(
        "event_id",
        "coalesce(nullif(event_type, 'click'), 'other') AS et",
        "CASE WHEN value > 100 THEN 'hi' WHEN value > 50 THEN 'mid' ELSE 'lo' END AS tier",
        "get_json_object(props, '$.missing') IS NULL AS miss_is_null",
        "coalesce(get_json_object(props, '$.missing'), 'dflt') AS filled",
        "least(coalesce(value, 0.0d), 100.0d) AS capped",
    )


@register(
    "conditional_aggs",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           count(*) FILTER (value > 100) AS n_big,
           bool_or(value > 400) AS any_huge,
           bool_and(value >= 0) AS all_nonneg,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) FILTER (user_id % 2 = 0) / 100.0 AS even_user_sum,
           max_by(event_id, value) AS top_event
    FROM events GROUP BY event_type
    """,
    tags=("relational", "agg"),
)
def q_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregates: count_if, bool_or/and, filtered sum,
    max_by (value is continuous — argmax ties don't arise in practice)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count_if(F.col("value") > 100).alias("n_big"),
        F.bool_or(F.col("value") > 400).alias("any_huge"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
        (
            F.sum(
                F.when(
                    F.col("user_id") % 2 == 0,
                    F.floor(F.col("value") * 100 + F.lit(0.5)),
                )
            )
            / F.lit(100.0)
        ).alias("even_user_sum"),
        F.max_by("event_id", "value").alias("top_event"),
    )


@register(
    "hash_sample_10pct",
    oracle="""
    SELECT event_type, count(*) AS n,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total
    FROM events
    WHERE ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT % 100 < 10
    GROUP BY event_type
    """,
    tags=("sampling",),
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% hash sample: md5(key) mod 100 — reproducible across
    engines/runs/partitionings (unlike TABLESAMPLE), the right way to sample
    a 100 TB table consistently between pipeline stages."""
    ev = load(spark, sf_dir, "events")
    bucket = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100
    )
    return (
        ev.filter(bucket < 10)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), exact_sum(F.col("value")).alias("total"))
    )


@register(
    "orc_engine_roundtrip",
    oracle="""
    SELECT c_mktsegment, count(*) AS n,
           sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0 AS bal
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("parity", "orc", "source"),
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink → source round trip through the engine (third columnar
    format after parquet/csv/json; oracle sees only the original table)."""

    from .plans.compiler import compile_pipeline, run_pipeline
    from .spec import load_spec

    outdir = scratch_dir("orc_rt_") + "/customer"
    run_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": f"{sf_dir}/customer.parquet"},
                "filters": [
                    {"type": "select", "columns": ["c_custkey", "c_mktsegment", "c_acctbal"]},
                ],
                "out": {"type": "orc", "path": outdir},
            }
        ),
    )
    back = compile_pipeline(
        spark,
        load_spec({"in": {"type": "orc", "path": outdir}, "out": {"type": "null"}}),
    )
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), exact_sum(F.col("c_acctbal")).alias("bal")
    )


@register(
    "gapfill_hourly",
    oracle="""
    WITH hourly AS (
      SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, min(h) AS mn, max(h) AS mx FROM hourly GROUP BY user_id
    ), grid AS (
      SELECT s.user_id, t.u AS h
      FROM spans s, unnest(generate_series(s.mn, s.mx)) t(u)
    )
    SELECT g.user_id, g.h AS bucket_hour, coalesce(hy.n, 0) AS n_events
    FROM grid g LEFT JOIN hourly hy ON g.user_id = hy.user_id AND g.h = hy.h
    """,
    tags=("timeseries",),
)
def q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: per-key dense hourly grid (sequence + explode)
    left-joined against observed counts, zero-filled — the resample/asfreq
    primitive. Grid generation is per-key bounded, never a driver loop."""
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "user_id",
            F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
        )
        .groupBy("user_id", "h")
        .agg(F.count("*").alias("n"))
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("h").alias("mn"), F.max("h").alias("mx")
    )
    grid = spans.select(
        "user_id", F.explode(F.sequence("mn", "mx")).alias("bucket_hour")
    )
    return grid.join(
        hourly,
        (grid.user_id == hourly.user_id) & (grid.bucket_hour == hourly.h),
        "left",
    ).select(
        grid.user_id,
        "bucket_hour",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
    )


@register(
    "bag_setops",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_quantity > 40
    UNION ALL
    SELECT l_partkey FROM lineitem WHERE l_discount > 0.08
    EXCEPT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    """,
    tags=("relational", "setops"),
)
def q_bag_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set-ops: UNION ALL + EXCEPT ALL (duplicate-preserving)."""
    li = load(spark, sf_dir, "lineitem")
    hot = li.filter(F.col("l_quantity") > 40).select("l_partkey")
    disc = li.filter(F.col("l_discount") > 0.08).select("l_partkey")
    returned = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return hot.unionAll(disc).exceptAll(returned)


@register(
    "spec_join_aggregate",
    oracle="""
    SELECT n.n_name, count(*) AS n_customers,
           sum(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) / 100.0 AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > 0
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    tags=("spec", "relational"),
)
def q_spec_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full analytic pipeline declared IN THE SPEC: filter → broadcast-join
    enrichment → group-aggregate → sort. The spec surface carries the whole
    query — a reference user's YAML pipeline ports 1:1."""
    from .plans.compiler import compile_pipeline
    from .spec import load_spec

    return compile_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": f"{sf_dir}/customer.parquet"},
                "filters": [
                    {"type": "filter", "predicate": "c_acctbal > 0"},
                    {
                        "type": "join",
                        "source": {"type": "parquet", "path": f"{sf_dir}/nation.parquet"},
                        "condition": "c_nationkey = n_nationkey",
                        "how": "inner",
                        "broadcast": True,
                    },
                    {
                        "type": "aggregate",
                        "group_by": ["n_name"],
                        "aggs": {
                            "n_customers": "count(*)",
                            "total_bal": "sum(floor(c_acctbal * 100 + 0.5)) / 100.0D",
                        },
                    },
                    {"type": "sort", "by": ["n_name"]},
                ],
                "out": {"type": "null"},
            }
        ),
    )


@register(
    "spec_dedup_sql",
    oracle="""
    WITH latest AS (
      SELECT user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT event_type, count(*) AS n_users,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS total
    FROM latest WHERE rn = 1 GROUP BY event_type
    """,
    tags=("spec", "dedup"),
)
def q_spec_dedup_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spec-declared deterministic dedup (latest event per user via
    order_by survivor) + SQL stage — the 'keep newest record per key'
    pipeline every CDC/ingest system needs."""
    from .plans.compiler import compile_pipeline
    from .spec import load_spec

    return compile_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": f"{sf_dir}/events.parquet"},
                "filters": [
                    *events_ts_normalize_filters(sf_dir),
                    {
                        "type": "dedup",
                        "columns": ["user_id"],
                        "order_by": ["ts desc", "event_id desc"],
                    },
                    {
                        "type": "sql",
                        "query": """
                            SELECT event_type, count(*) AS n_users,
                                   sum(floor(value * 100 + 0.5)) / 100.0D AS total
                            FROM __input GROUP BY event_type
                        """,
                    },
                ],
                "out": {"type": "null"},
            }
        ),
    )


@register(
    "spec_training_prep",
    oracle=r"""
    WITH scored AS (
      SELECT doc_id, text, source,
             len(string_split(text, ' ')) AS n_words,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
               AS n_bpeish
      FROM documents
    ), kept AS (
      SELECT * FROM scored WHERE n_words BETWEEN 5 AND 400
    ), survivors AS (
      SELECT md5(text) AS h, min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
    )
    SELECT k.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(k.n_words) AS BIGINT) AS total_words,
           CAST(sum(k.n_bpeish) AS BIGINT) AS total_bpeish_tokens
    FROM kept k JOIN survivors s ON k.doc_id = s.doc_id
    GROUP BY k.source
    """,
    tags=("spec", "llm-prep", "composite"),
)
def q_spec_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM-prep pipeline a reference user would actually run, as PURE
    SPEC (r5 composite demo): quality scoring (word + BPE-ish token
    counts via expression stages) → length filter → exact first-wins
    dedup (md5 + keyed survivor stage) → per-source corpus accounting
    (SQL stage). One declarative document end to end — no Python between
    the stages — compiled by the same engine that runs the parity
    pipelines; every stage is a narrow expression or a keyed exchange
    Catalyst already optimizes."""
    from .plans.compiler import compile_pipeline
    from .spec import load_spec

    return compile_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": f"{sf_dir}/documents.parquet"},
                "filters": [
                    {
                        "type": "with_column",
                        "name": "n_words",
                        "expr": "size(split(text, ' '))",
                    },
                    {
                        "type": "with_column",
                        "name": "n_bpeish",
                        "expr": (
                            r"size(regexp_extract_all(text,"
                            r" '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0))"
                        ),
                    },
                    {
                        "type": "filter",
                        "predicate": "n_words >= 5 AND n_words <= 400",
                    },
                    {"type": "with_column", "name": "h", "expr": "md5(text)"},
                    {
                        "type": "dedup",
                        "columns": ["h"],
                        "order_by": ["doc_id asc"],
                    },
                    {
                        "type": "sql",
                        "query": """
                            SELECT source,
                                   count(*) AS n_docs,
                                   sum(n_words) AS total_words,
                                   sum(n_bpeish) AS total_bpeish_tokens
                            FROM __input GROUP BY source
                        """,
                    },
                ],
                "out": {"type": "null"},
            }
        ),
    )


_FRONT_DOOR_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


@register(
    "spec_front_door_pipeline",
    oracle=r"""
    WITH fp AS (
      SELECT doc_id, text, lang, source, n_chars,
             md5(array_to_string(list_sort(string_split(text, ' ')), ' '))
               AS fingerprint
      FROM documents
    ), dd AS (
      SELECT * EXCLUDE (__rn) FROM (
        SELECT fp.*, row_number() OVER (
          PARTITION BY fingerprint ORDER BY doc_id) AS __rn
        FROM fp
      ) WHERE __rn = 1
    ), li0 AS (
      SELECT dd.*, list_max([
        {'hits': len(list_intersect(list_distinct(string_split(text, ' ')),
                     ['der','die','das','und'])), 'rank': 4, 'lang': 'de'},
        {'hits': len(list_intersect(list_distinct(string_split(text, ' ')),
                     ['the','a','of','and'])),    'rank': 3, 'lang': 'en'},
        {'hits': len(list_intersect(list_distinct(string_split(text, ' ')),
                     ['el','la','los','y'])),     'rank': 2, 'lang': 'es'},
        {'hits': len(list_intersect(list_distinct(string_split(text, ' ')),
                     ['le','la','les','et'])),    'rank': 1, 'lang': 'fr'}
      ]) AS best
      FROM dd
    ), li AS (
      SELECT * EXCLUDE (best),
             best.lang AS lang_guess, best.hits::INT AS marker_hits
      FROM li0 WHERE best.lang = lang
    ), q0 AS (
      SELECT li.*,
             len(string_split(text, ' ')) AS __ntok,
             length(text) * 1.0 / len(string_split(text, ' ')) AS __mlen,
             len(list_intersect(string_split(text, ' '),
                                ['the','a','of','and'])) > 0 AS __stop
      FROM li
    ), q AS (
      SELECT * EXCLUDE (__ntok, __mlen, __stop), floor((
          (CASE WHEN __ntok BETWEEN 10 AND 100000 THEN 0.4::DOUBLE ELSE 0.0::DOUBLE END)
        + (CASE WHEN __stop THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
        + (CASE WHEN __mlen BETWEEN 3.0 AND 12.0 THEN 0.3::DOUBLE ELSE 0.0::DOUBLE END)
        ) * 100 + 0.5) / 100.0 AS quality
      FROM q0
    ), qf AS (
      SELECT * FROM q WHERE quality >= 0.4
    ), pii AS (
      SELECT * EXCLUDE (text),
             regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 'table', '<TBL>', 'g') AS text,
             len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::INT AS n_email,
             len(regexp_extract_all(text, 'table'))::INT AS n_tbl
      FROM qf
    )
    SELECT * EXCLUDE (__rn) FROM (
      SELECT pii.*, row_number() OVER (
        PARTITION BY source ORDER BY md5(doc_id::VARCHAR), doc_id) AS __rn
      FROM pii
    ) WHERE __rn <= 8
    """,
    tags=("spec", "llm-prep", "composite", "front-door"),
)
def q_spec_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r8 declarative LLM-prep stages driven through the YAML front
    door itself — ``load_spec → compile_pipeline`` — under a full value
    oracle (VERDICT r8 item 1: the spec parser/compiler path is the
    reference's own e2e level, ``TestMapReduceExecutor.java:76-110`` runs
    ``embulk_mapred_config.yml``; the prior spec_* queries compile generic
    expression stages, not the r8 stage types). Chain: fingerprint → exact
    content dedup (first-wins) → language gate → quality gate → PII scrub
    (the corpus-firing 'table' pattern proves the text REPLACEMENT hashes,
    the email pattern the zero-hit path) → per-source cap (deterministic
    md5-ordered sample). Plan shape: the append stages ride ONE struct-pack
    projection each, so the whole document is two exchanges (dedup key +
    cap window) — plan-guarded in tests/test_plan_quality.py."""
    from .plans.compiler import compile_pipeline
    from .spec import load_spec

    return compile_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": f"{sf_dir}/documents.parquet"},
                "filters": [
                    {"type": "fingerprint"},
                    {
                        "type": "dedup",
                        "columns": ["fingerprint"],
                        "order_by": ["doc_id"],
                    },
                    {"type": "language_id"},
                    {"type": "filter", "predicate": "lang_guess = lang"},
                    {"type": "quality_score"},
                    {"type": "filter", "predicate": "quality >= 0.4"},
                    {
                        "type": "pii_scrub",
                        "patterns": {
                            "email": _FRONT_DOOR_EMAIL,
                            "tbl": "table",
                        },
                    },
                    {
                        "type": "sample_k_per_group",
                        "group_by": ["source"],
                        "k": 8,
                        "hash_on": "doc_id",
                    },
                ],
                "out": {"type": "null"},
            }
        ),
    )


def _spec_prep_oracle() -> str:
    """Composite DuckDB replay of the ``spec_prep_pipeline`` YAML chain —
    each fragment is the corresponding stage's own established oracle
    (text_stats / token_count_bpe / quality_repetition / contamination_ngram
    / the minhash+recursive-CC pair behind dedup_survivors / the
    chunk_token_windows window math), composed over the SAME intermediate
    frames the spec compiler threads through the stages."""
    prelude = _minhash_banded_prelude(_MINHASH_HASHES, _MINHASH_BANDS).replace(
        "FROM documents", "FROM clean"
    )
    return rf"""
    WITH RECURSIVE ts AS (
      SELECT doc_id, text, lang, source, n_chars,
             len(string_split(text, ' '))::INT AS n_tokens,
             length(text)::INT AS n_chars_computed,
             floor((length(text) * 1.0 / len(string_split(text, ' '))) * 100 + 0.5) / 100.0
               AS avg_token_len,
             len(string_split(text, ' '))::INT AS n_words,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::INT
               AS n_bpeish_tokens,
             len(list_distinct(
               regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))::INT
               AS n_unique_tokens
      FROM documents
    ), rep1 AS (
      SELECT doc_id, tok, count(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY 1, 2
    ), rep AS (
      SELECT doc_id,
             floor((max(c) / sum(c)) * 10000 + 0.5) / 10000.0 AS top_token_frac,
             floor((count(*) / sum(c)) * 10000 + 0.5) / 10000.0 AS unique_token_frac
      FROM rep1 GROUP BY doc_id
    ), kept AS (
      SELECT ts.*, rep.top_token_frac, rep.unique_token_frac,
             (rep.top_token_frac <= 0.2 AND rep.unique_token_frac >= 0.3) AS rep_keep
      FROM ts JOIN rep USING (doc_id)
      WHERE (rep.top_token_frac <= 0.2 AND rep.unique_token_frac >= 0.3)
        AND doc_id % 97 <> 0
    ), cg AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(w) - 4, 1) + 1),
               i -> array_to_string(w[i:i+4], ' ')))) AS g
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM kept)
    ), bg AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(
               range(1, greatest(len(w) - 4, 1) + 1),
               i -> array_to_string(w[i:i+4], ' ')))) AS g
      FROM (SELECT string_split(text, ' ') AS w FROM documents WHERE doc_id % 97 = 0)
    ), flagged AS (
      SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (g)
    ), clean AS (
      SELECT * FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
    ), {prelude}, pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
                                 AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ), reach(node, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ), clusters AS (
      SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
    ), surv AS (
      SELECT * FROM clean WHERE doc_id NOT IN (
        SELECT doc_id FROM clusters WHERE doc_id <> cluster_id
      )
    ), st AS (
      SELECT s.*,
             unnest(range(0, ((greatest(len(w) - 32, 0) + 23) // 24) * 24 + 1, 24)) AS start,
             w
      FROM (SELECT surv.*, string_split(text, ' ') AS w FROM surv) s
    )
    SELECT doc_id, text, lang, source, n_chars, n_tokens, n_chars_computed,
           avg_token_len, n_words, n_bpeish_tokens, n_unique_tokens,
           top_token_frac, unique_token_frac, rep_keep,
           (start // 24)::INT AS chunk_idx,
           array_to_string(w[start+1:start+32], ' ') AS chunk_text,
           len(string_split(array_to_string(w[start+1:start+32], ' '), ' '))::INT
             AS chunk_tokens
    FROM st
    """


_SPEC_PREP_BENCH_CACHE: dict[str, str] = {}


def _spec_prep_benchmark(spark: SparkSession, sf_dir: str) -> str:
    """The decontaminate stage's benchmark fixture (every ``doc_id % 97``
    document), built ONCE per ``sf_dir`` in the shared plan-build phase —
    the same memoized-state pattern as ``_cdc_three_version_state``
    (VERDICT r11 item 7: registry queries stay side-effect-free; the
    deterministic fixture write is amortized into the first consumer, so
    the bench entry prices the pipeline, not a repeated fixture build)."""
    import os

    cached = _SPEC_PREP_BENCH_CACHE.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached
    bench_path = scratch_dir("q_spec_prep_") + "/benchmark"
    docs = load(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text").write.mode(
        "overwrite"
    ).parquet(bench_path)
    _SPEC_PREP_BENCH_CACHE[sf_dir] = bench_path
    return bench_path


@register(
    "spec_prep_pipeline",
    oracle=_spec_prep_oracle(),
    tags=("spec", "llm-prep", "composite", "front-door"),
)
def q_spec_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The six spec stage types ``spec_front_door_pipeline`` left uncovered
    (VERDICT r9 item 1), driven through the YAML front door itself —
    ``load_spec → compile_pipeline`` — under a full value oracle: text_stats
    → token_count → repetition_stats (id-keyed join-back) → rep_keep gate →
    benchmark carve-out → decontaminate (exact 5-gram method, benchmark
    read from a real parquet ``in``-block the fn stages first) →
    minhash_dedup (banded LSH candidates → connected components → losers
    dropped) → chunk (32-token windows, stride 24, fan-out last so every
    surviving doc materializes training examples). With
    ``spec_front_door_pipeline`` this puts the ENTIRE declarative stage
    surface under driver oracles — the reference's own e2e level
    (``TestMapReduceExecutor.java:76-110``). Scale notes: the append stages
    ride struct-pack projections (map-only), repetition_stats is one
    id-keyed shuffle, both anti-join stages shuffle on high-cardinality
    gram/band keys with eval-set-sized build sides, chunk fans out inside
    codegen."""

    from .plans.compiler import compile_pipeline
    from .spec import load_spec

    bench_path = _spec_prep_benchmark(spark, sf_dir)

    return compile_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": f"{sf_dir}/documents.parquet"},
                "filters": [
                    {"type": "text_stats"},
                    {"type": "token_count"},
                    {"type": "repetition_stats", "id": "doc_id"},
                    {"type": "filter", "predicate": "rep_keep"},
                    {"type": "filter", "predicate": "doc_id % 97 <> 0"},
                    {
                        "type": "decontaminate",
                        "benchmark": {"type": "parquet", "path": bench_path},
                        "method": "ngram",
                        "n": 5,
                        "id": "doc_id",
                    },
                    {
                        "type": "minhash_dedup",
                        "id": "doc_id",
                        "num_hashes": _MINHASH_HASHES,
                        "bands": _MINHASH_BANDS,
                        "shingle_n": 3,
                    },
                    {"type": "chunk", "window": 32, "stride": 24},
                ],
                "out": {"type": "null"},
            }
        ),
    )


@register(
    "spec_partitioned_pipeline",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value,
           props,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents,
           CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket_hour
    FROM events
    WHERE event_id % 10 <> 0 AND epoch(ts) < 1704672000
    """,
    tags=("spec", "parity", "partitioning", "sink", "front-door"),
)
def q_spec_partitioned_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FLAGSHIP shape end to end through the YAML front door
    (VERDICT r9 item 2; ``TestMapReduceExecutor.java:94-110`` runs
    ``embulk_mapred_partitioning_config.yml``): ``in`` → filter chain →
    ``partitioning`` (hour bucket + map_side_partition_split salt) → a
    partition_by_bucket parquet sink, executed by ``run_pipeline`` and then
    READ BACK from the committed ``__bucket=<hour>`` directory layout — the
    oracle hashes row content AND the directory each row landed in, so a
    bucketing bug, a salt leaking into the output, or a row written to the
    wrong partition all flip the hash. The salt spreads one hot hour over 4
    reduce tasks and must be invisible in the result (content-hash salt:
    deterministic under task retry — partitioning.salt_expr). Plan shape:
    exactly ONE exchange (bucket+salt repartition) between scan and sink,
    asserted in tests/test_plan_quality.py. The time-range filter (the
    first week, epoch 1704672000 = 2024-01-08T00Z) bounds the layout at
    ~168 hour dirs × ≤4 salt files: a salted hour bucket intrinsically
    writes one file per salt per bucket — at production volume that IS the
    wanted parallelism (each file a reduce task's output), but at catalog
    scale an unbounded month costs ~2900 near-empty file commits that
    price filesystem overhead, not the engine."""

    from .plans.compiler import run_pipeline
    from .spec import load_spec

    out = scratch_dir("q_spec_partitioned_") + "/out"
    spec = load_spec(
        {
            "in": {"type": "parquet", "path": f"{sf_dir}/events.parquet"},
            "filters": [
                *events_ts_normalize_filters(sf_dir),
                {
                    "type": "filter",
                    "predicate": "event_id % 10 <> 0 "
                    "AND unix_timestamp(ts) < 1704672000",
                },
                {
                    "type": "with_column",
                    "name": "value_cents",
                    "expr": "CAST(floor(value * 100 + 0.5) AS BIGINT)",
                },
            ],
            "exec": {
                "partitioning": {
                    "type": "timestamp",
                    "unit": "hour",
                    "column": "ts",
                    "map_side_partition_split": 4,
                },
            },
            "out": {
                "type": "parquet",
                "path": out,
                "partition_by_bucket": True,
            },
        }
    )
    run_pipeline(spark, spec)
    rb = spark.read.parquet(out)
    # ts surfaces as exact epoch micros, not a raw timestamp column — the
    # catalog-wide convention (every green oracle converts via
    # epoch_us/DATE): the driver has shipped three different physical ts
    # encodings across rounds, and integer micros hash identically under
    # all of them on both engines while a raw timestamp's canonical form
    # is at the mercy of each engine's tz-awareness for that encoding
    return rb.select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
        "value_cents",
        F.col("__bucket").cast("long").alias("bucket_hour"),
    )


# ---------------------------------------------------------------------------
# LLM-training-data pipeline surface, round 2: repetition quality rules,
# token-window chunking, benchmark decontamination, stratified source mixing,
# PII scrubbing, streaming session windows
# ---------------------------------------------------------------------------


@register(
    "quality_repetition",
    oracle="""
    WITH t AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ), pt AS (
      SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2
    ), s AS (
      SELECT doc_id, max(c) AS top_c, CAST(sum(c) AS BIGINT) AS n_tokens,
             count(*) AS n_uniq
      FROM pt GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           floor((top_c / n_tokens) * 10000 + 0.5) / 10000.0 AS top_token_frac,
           floor((n_uniq / n_tokens) * 10000 + 0.5) / 10000.0 AS unique_token_frac,
           (floor((top_c / n_tokens) * 10000 + 0.5) / 10000.0 <= 0.2
            AND floor((n_uniq / n_tokens) * 10000 + 0.5) / 10000.0 >= 0.3) AS keep
    FROM s
    """,
    tags=("text", "quality"),
)
def q_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (top-token fraction, unique-token
    fraction) — the cheap pre-filter before model-based quality scoring."""
    from .operators.text import repetition_quality

    return repetition_quality(load(spark, sf_dir, "documents"))


@register(
    "chunk_token_windows",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), s AS (
      SELECT doc_id, w,
             unnest(range(0, ((greatest(len(w) - 64, 0) + 47) // 48) * 48 + 1, 48)) AS st
      FROM d
    )
    SELECT doc_id, (st // 48)::INT AS chunk_idx,
           array_to_string(w[st+1:st+64], ' ') AS chunk_text,
           len(string_split(array_to_string(w[st+1:st+64], ' '), ' '))::INT AS chunk_tokens
    FROM s
    """,
    tags=("text", "chunking"),
)
def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token windows, stride 48) — the
    training-example materialization step; rows fan out inside codegen."""
    from .operators.text import chunk_token_windows

    return chunk_token_windows(load(spark, sf_dir, "documents"))


@register(
    "contamination_ngram",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_distinct(
               list_transform(range(1, greatest(len(w) - 4, 1) + 1),
                              i -> array_to_string(w[i:i+4], ' '))) AS sh
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ), c AS (
      SELECT doc_id, unnest(sh) AS g FROM toks WHERE doc_id % 97 <> 0
    ), b AS (
      SELECT DISTINCT unnest(sh) AS g FROM toks WHERE doc_id % 97 = 0
    )
    SELECT c.doc_id, count(*) AS n_overlapping_ngrams
    FROM c JOIN b USING (g) GROUP BY c.doc_id
    """,
    tags=("text", "dedup", "contamination"),
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any 5-gram with the
    held-out benchmark slice (doc_id % 97 == 0 stands in for the eval set)."""
    from .operators.text import ngram_contamination

    docs = load(spark, sf_dir, "documents")
    return ngram_contamination(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        n=5,
    )


@register(
    "stratified_sample_sources",
    oracle="""
    SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 <
          CASE source WHEN 'src0' THEN 50 WHEN 'src1' THEN 20 ELSE 10 END
    GROUP BY source
    """,
    tags=("sampling", "mixing"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-mixing weights: per-source deterministic hash sampling at
    different rates (50%/20%/10%) — how a training pipeline reweights source
    domains without a shuffle or per-group sort."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100
    )
    rate = (
        F.when(F.col("source") == "src0", 50)
        .when(F.col("source") == "src1", 20)
        .otherwise(10)
    )
    return (
        d.filter(bucket < rate)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").alias("total_chars"))
    )


@register(
    "pii_scrub_props",
    oracle="""
    SELECT event_id,
           len(regexp_extract_all(props, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::INT AS n_email,
           len(regexp_extract_all(props, '[0-9]{2,}'))::INT AS n_digits,
           regexp_replace(regexp_replace(props,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '[0-9]{2,}', '<DIGITS>', 'g') AS scrubbed
    FROM events
    """,
    tags=("text", "pii"),
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over a payload column: regexp chain with per-pattern hit
    counts so redaction rates are auditable at corpus scale."""
    from .operators.text import pii_scrub

    return pii_scrub(
        load(spark, sf_dir, "events"),
        "props",
        "event_id",
        patterns={
            "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
            "digits": r"[0-9]{2,}",
        },
    )


@register(
    "stream_session_windows",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id, value,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      FROM events
    ), s AS (
      SELECT user_id, ts, value,
             sum(CASE WHEN gap_us IS NULL OR gap_us >= 1800 * 1000000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
      FROM g
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_sec,
           count(*) AS n_events,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
    FROM s GROUP BY user_id, seq
    """,
    tags=("streaming", "session"),
)
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming native sessionization (F.session_window, 30-min
    gap) driven to completion with availableNow — must equal the batch
    lag/running-sum sessionization (the oracle). Spark merges events strictly
    closer than the gap; the oracle's >= mirrors that boundary."""
    from .streaming.ingest import (
        read_events_stream,
        run_stream_to_memory,
        session_window_stream,
    )

    stream = session_window_stream(read_events_stream(spark, sf_dir))
    return run_stream_to_memory(
        stream, "stream_session_windows", output_mode="complete"
    )


@register(
    "stream_purchase_signup_join",
    oracle="""
    SELECT p.user_id, p.event_id AS p_event_id, s.event_id AS s_event_id
    FROM events p JOIN events s
      ON p.user_id = s.user_id
     AND p.event_type = 'purchase' AND s.event_type = 'signup'
     AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 DAY
    """,
    tags=("streaming", "join"),
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (watermarked both sides, event-time range
    bound) driven to completion with availableNow — must equal the batch
    time-range join (the oracle)."""
    from .streaming.ingest import (
        read_events_stream,
        run_stream_to_memory,
        stream_stream_join,
    )

    ev = read_events_stream(spark, sf_dir)
    return run_stream_to_memory(
        stream_stream_join(ev), "stream_purchase_signup_join", output_mode="append"
    )


@register(
    "training_shuffle_shards",
    oracle="""
    WITH h AS (
      SELECT doc_id, md5(doc_id::VARCHAR) AS hk FROM documents
    )
    SELECT doc_id,
           (('0x' || substr(hk, 1, 15))::BIGINT % 16)::INT AS shard,
           (row_number() OVER (
              PARTITION BY ('0x' || substr(hk, 1, 15))::BIGINT % 16
              ORDER BY hk, doc_id) - 1)::INT AS pos_in_shard
    FROM h
    """,
    tags=("sampling", "shuffle"),
)
def q_training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: hash-derived shard + in-shard
    position. Reproducible across runs/engines/partitionings (unlike
    orderBy(rand())), and scalable — per-shard windows, never a global sort."""
    d = load(spark, sf_dir, "documents")
    hk = F.md5(F.col("doc_id").cast("string"))
    shard = (
        F.conv(F.substring(hk, 1, 15), 16, 10).cast("long") % 16
    ).cast("int")
    w = W.partitionBy(shard).orderBy(hk, F.col("doc_id"))
    return d.select(
        "doc_id",
        shard.alias("shard"),
        (F.row_number().over(w) - 1).alias("pos_in_shard"),
    )


@register(
    "sample_k_per_group",
    oracle="""
    SELECT event_type, event_id, user_id FROM (
      SELECT event_type, event_id, user_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5(event_id::VARCHAR), event_id) AS rn
      FROM events
    ) WHERE rn <= 5
    """,
    tags=("sampling",),
)
def q_sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample (hash-ordered window top-k): the
    reproducible 'inspect 5 examples per class' pattern — one exchange on the
    group key, no global sort, stable across runs and engines."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_type", "event_id", "user_id")
    )


@register(
    "unpivot_measures",
    oracle="""
    SELECT metric, count(*) AS n,
           sum(CAST(floor(val * 100 + 0.5) AS BIGINT)) / 100.0 AS total
    FROM (SELECT l_quantity, l_discount, l_tax FROM lineitem)
         UNPIVOT (val FOR metric IN (l_quantity, l_discount, l_tax))
    GROUP BY metric
    """,
    tags=("relational", "unpivot"),
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide measures to long (metric, value) — the Expand
    operator, no shuffle until the final agg."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.unpivot(
            ids=[],
            values=["l_quantity", "l_discount", "l_tax"],
            variableColumnName="metric",
            valueColumnName="val",
        )
        .groupBy("metric")
        .agg(F.count("*").alias("n"), exact_sum(F.col("val")).alias("total"))
    )


@register(
    "exact_percentiles",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderpriority,
           floor((quantile_cont(cents, 0.5) / 100.0) * 10000 + 0.5) / 10000.0 AS median_price,
           floor((quantile_cont(cents, 0.9) / 100.0) * 10000 + 0.5) / 10000.0 AS p90_price,
           count(*) AS n
    FROM c GROUP BY o_orderpriority
    """,
    tags=("relational", "agg", "percentile"),
)
def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (vs the approx_distinct_users sketch entry):
    linear-interpolated quantiles over integer cents, so both engines
    interpolate between the same exact integers."""
    o = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
    return o.groupBy("o_orderpriority").agg(
        d_round(F.percentile(cents, F.lit(0.5)) / F.lit(100.0), 4).alias(
            "median_price"
        ),
        d_round(F.percentile(cents, F.lit(0.9)) / F.lit(100.0), 4).alias("p90_price"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "line_dedup_c4",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), s AS (
      SELECT doc_id, w, unnest(range(0, (len(w) + 9) // 10)) AS pos FROM d
    ), c AS (
      SELECT doc_id, pos,
             array_to_string(w[pos*10+1 : pos*10+10], ' ') AS chunk
      FROM s
    ), r AS (
      SELECT doc_id, pos, chunk,
             row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
      FROM c
    )
    SELECT doc_id,
           string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE rn = 1)
             AS clean_text,
           count(*) FILTER (WHERE rn = 1) AS n_kept,
           count(*) FILTER (WHERE rn > 1) AS n_dropped
    FROM r GROUP BY doc_id
    HAVING count(*) FILTER (WHERE rn = 1) > 0
    """,
    tags=("text", "dedup", "c4"),
)
def q_line_dedup_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-wide span dedup: global first-wins dedup of 10-word
    chunks, documents rebuilt from surviving chunks in order. The exchange
    carries one row per DISTINCT chunk (argmin aggregate), never a
    corpus-wide window."""
    from .operators.text import corpus_chunk_dedup

    return corpus_chunk_dedup(load(spark, sf_dir, "documents"))


@register(
    "pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             len(string_split(text, ' '))::BIGINT AS n_tokens
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING
             )::BIGINT AS cum
      FROM t
    )
    SELECT doc_id, source, n_tokens,
           (cum - n_tokens) // 512 AS pack_bin,
           (cum - n_tokens) % 512 AS bin_offset,
           ((cum - 1) // 512) - ((cum - n_tokens) // 512) + 1 AS n_bins_spanned
    FROM c
    """,
    tags=("text", "packing", "training"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (concat-then-chop at 512 tokens) per source
    shard: one partitioned cumulative-sum window, no global sort."""
    from .operators.text import pack_sequences

    return pack_sequences(load(spark, sf_dir, "documents"), seq_len=512)


@register(
    "vocab_topk",
    oracle="""
    SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    )
    GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT 200
    """,
    tags=("text", "vocab"),
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary top-200 by global token frequency — map-side
    combinable aggregate + TakeOrdered merge, no global sort."""
    from .operators.text import vocab_topk

    return vocab_topk(load(spark, sf_dir, "documents"))


from .operators.similarity import (  # noqa: E402
    ivf_pq_oracle_sql,
    random_projection_oracle_sql,
)


from .operators.similarity import mmr_oracle_sql  # noqa: E402


@register(
    "mmr_diverse_topk",
    oracle=mmr_oracle_sql(),
    tags=("similarity", "diversity"),
)
def q_mmr_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
    1998): per query, greedily pick k=3 results trading relevance against
    redundancy — the retrieval-diversity op that keeps near-identical
    passages out of one prompt's context. Corpus cost = one relevance
    shortlist scan; the greedy tail runs on n_q × shortlist rows. The
    oracle unrolls the greedy loop (the k-means-chain technique)."""
    from .operators.similarity import mmr_rerank_topk

    return mmr_rerank_topk(load(spark, sf_dir, "embeddings"))


@register(
    "embedding_random_projection",
    oracle=random_projection_oracle_sql(),
    tags=("similarity", "projection"),
)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL sign-projection (64→8 dims, deterministic ±1 matrix inlined on
    both engine sides) + top-5 cosine in the projected space — the
    dimensionality-reduction front end any pairwise stage composes with:
    map-only projection once, then 8× cheaper math and shuffle bytes
    everywhere downstream."""
    from .operators.similarity import random_projection_topk

    return random_projection_topk(load(spark, sf_dir, "embeddings"))


@register(
    "ann_ivf_pq_topk",
    oracle=ivf_pq_oracle_sql(),
    tags=("similarity", "ivf", "pq"),
)
def q_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN composite (FAISS IVFx,PQy recipe): IVF coarse
    probe → PQ-ADC scoring inside the probed lists → exact re-rank of the
    ADC shortlist. Each half exists as its own row (`ann_ivf_topk`,
    `ann_pq_adc_topk`); this row proves they COMPOSE — the 100 TB serving
    path where the probe prunes the corpus, codes replace vector math, and
    only `rerank` raw vectors per query are ever touched at full precision."""
    from .operators.similarity import ivf_pq_topk

    return ivf_pq_topk(load(spark, sf_dir, "embeddings"))


from .operators.similarity import ivf_pq_indexed_oracle_sql  # noqa: E402


@register(
    "ann_ivf_pq_incremental_state",
    oracle=ivf_pq_indexed_oracle_sql(),
    tags=("similarity", "ivf", "pq", "incremental", "sink"),
)
def q_ann_ivf_pq_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF-PQ composite as PERSISTED STANDING STATE (r13, VERDICT r12
    item 1) — the ANN sibling of ``dedup_incremental_state`` /
    ``semantic_dedup_incremental_state``: increment 1 (even vec_ids)
    trains the centroid table + PQ codebook ONCE (persisted to parquet)
    and codes itself into the index through the pointer-committed merge
    sink; increment 2 (odd vec_ids) is ASSIGN-ONLY against the STORED
    artifacts (two broadcast joins + two partial-agg exchanges, zero
    training — plan-guarded) and upserts its codes bucket-pruned. The
    search then runs PROBE-ONLY against the committed index — the 100 TB
    serving story, where neither training nor corpus encoding ever
    re-runs per query. The oracle replays the frozen-artifact batch
    equivalent (assignment is per-vector against fixed artifacts, so the
    two-increment construction must reproduce it bit-for-bit), pinning
    the operator AND the sink round-trip together."""

    from .operators.similarity import (
        ivf_pq_index_assign,
        ivf_pq_index_train,
        ivf_pq_topk_indexed,
    )
    from .sinks.writer import read_merge_state, write_sink
    from .spec import SinkSpec

    emb = load(spark, sf_dir, "embeddings")
    root = scratch_dir("q_ivfpq_incr_")
    # merge_order is the monotone ingest version, so an upstream UPDATE's
    # re-assigned codes always win over stale ones (r13 review finding:
    # ordering by `code` kept whichever code sorted higher)
    sink = SinkSpec(
        type="parquet",
        path=f"{root}/index",
        mode="merge",
        merge_key=("cand_id", "s"),
        merge_order=("_ingest_version",),
        sort_by=("cid",),
    )
    # "lowest" matches this row's oracle (ivf_pq_indexed_oracle_sql
    # sort-limits the base_pred half) — id-gap robust because BOTH sides
    # sort-limit the same predicate; the probe row below pins the
    # "prefix" convention against the inline composite's oracle instead
    cents, cb = ivf_pq_index_train(
        emb.filter(F.col("vec_id") % 2 == 0), selection="lowest"
    )
    from .session import run_independent_actions

    # the two artifact writes are independent (r17, guide §2.6) — NOTE
    # this is the fixture's scratch dir; the production CDC ANN ingest
    # keeps its documented codebook-last crash ordering
    run_independent_actions(
        lambda: cents.write.parquet(f"{root}/centroids"),
        lambda: cb.write.parquet(f"{root}/codebook"),
    )
    stored = (
        spark.read.parquet(f"{root}/centroids"),
        spark.read.parquet(f"{root}/codebook"),
    )
    # increment 2's assign-only encoding is independent of increment 1's
    # merge commit — pipeline them (r17, guide §2.6): the lazy checkpoint
    # materializes increment 2's codes (small: ids + codes, never
    # vectors) while commit 1's driver tail runs; the state-dependent
    # MERGE of increment 2 still waits for commit 1
    a2 = (
        ivf_pq_index_assign(emb.filter(F.col("vec_id") % 2 == 1), *stored)
        .withColumn("_ingest_version", F.lit(2))
        .localCheckpoint(eager=False)
    )
    run_independent_actions(
        lambda: write_sink(
            ivf_pq_index_assign(
                emb.filter(F.col("vec_id") % 2 == 0), *stored
            ).withColumn("_ingest_version", F.lit(1)),
            sink,
        ),
        lambda: a2.count(),
    )
    write_sink(a2, sink)
    return ivf_pq_topk_indexed(
        read_merge_state(spark, f"{root}/index").select(
            "cand_id", "cid", "s", "code"
        ),
        *stored,
        emb,
    )


#: memoized per sf_dir (the `_cdc_three_version_state` amortization
#: pattern): the probe row prices the SERVING path, so the one-time
#: train+encode+commit happens on the first call only
_IVFPQ_INDEX_CACHE: dict[str, str] = {}


def _ivf_pq_persisted_index(spark: SparkSession, sf_dir: str) -> str:
    cached = _IVFPQ_INDEX_CACHE.get(sf_dir)
    if cached:
        return cached
    from .operators.similarity import ivf_pq_index_assign, ivf_pq_index_train
    from .sinks.writer import write_sink
    from .spec import SinkSpec

    emb = load(spark, sf_dir, "embeddings")
    root = scratch_dir("q_ivfpq_probe_")
    cents, cb = ivf_pq_index_train(emb)
    cents.write.parquet(f"{root}/centroids")
    cb.write.parquet(f"{root}/codebook")
    write_sink(
        ivf_pq_index_assign(
            emb,
            spark.read.parquet(f"{root}/centroids"),
            spark.read.parquet(f"{root}/codebook"),
        ).withColumn("_ingest_version", F.lit(1)),
        SinkSpec(
            type="parquet",
            path=f"{root}/index",
            mode="merge",
            merge_key=("cand_id", "s"),
            merge_order=("_ingest_version",),
            sort_by=("cid",),
        ),
    )
    _IVFPQ_INDEX_CACHE[sf_dir] = root
    return root


@register(
    "ann_ivf_pq_index_probe",
    oracle=ivf_pq_oracle_sql(),
    tags=("similarity", "ivf", "pq", "serving"),
)
def q_ann_ivf_pq_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVING path of the persisted IVF-PQ index priced alone (r13):
    the index/centroids/codebook are committed once (memoized per sf_dir —
    the `cdc_persisted_diff` amortization convention) and the row runs
    probe-only search: collected probe list ids pushed as a literal
    ``cid IN (...)`` filter that reaches the index parquet scan
    (PushedFilters — an inverted-list read of nprobe/n_centroids of the
    state, plan-guarded), ADC from codes, exact re-rank of `rerank` raw
    vectors. Same oracle as `ann_ivf_pq_topk` — a whole-corpus index built
    from the frozen stand-in artifacts must reproduce the inline composite
    bit-for-bit (pinned in tests/test_dedup_similarity.py); the bench gap
    between the two rows is what the standing index buys a repeat query."""
    from .operators.similarity import ivf_pq_topk_indexed
    from .sinks.writer import read_merge_state

    root = _ivf_pq_persisted_index(spark, sf_dir)
    return ivf_pq_topk_indexed(
        read_merge_state(spark, f"{root}/index").select(
            "cand_id", "cid", "s", "code"
        ),
        spark.read.parquet(f"{root}/centroids"),
        spark.read.parquet(f"{root}/codebook"),
        load(spark, sf_dir, "embeddings"),
    )


@register(
    "ann_recall_report",
    oracle=f"""
    WITH exact AS (
      SELECT query_id, cand_id FROM ( {_BRUTE_TOPK_SQL} ) e
    ), approx AS (
      SELECT query_id, cand_id FROM ( {ivf_pq_oracle_sql()} ) a
    ), counts AS (
      SELECT e.query_id, count(a.cand_id) AS hits
      FROM exact e LEFT JOIN approx a
        ON a.query_id = e.query_id AND a.cand_id = e.cand_id
      GROUP BY e.query_id
    )
    SELECT query_id, hits,
           floor(hits / 5.0 * 100 + 0.5) / 100.0 AS recall
    FROM counts
    """,
    tags=("similarity", "quality"),
)
def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF-PQ composite against brute-force ground truth
    (r13) — the quality dial every ANN deployment tunes (nprobe/n_codes/
    rerank trade recall for cost; this is the metric FAISS reports).
    Per-query ``(query_id, hits, recall)``; both inputs are the engine's
    own oracled rows, so the report composes two already-pinned plans and
    the oracle composes their SQL verbatim. The semi-join runs on two
    n_q × k frames — broadcast-sized regardless of corpus."""
    from .operators.similarity import (
        ann_recall_report,
        brute_force_topk,
        ivf_pq_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    return ann_recall_report(brute_force_topk(emb), ivf_pq_topk(emb), k=5)


@register(
    "stream_cdc_ann_index_ingest",
    oracle=ivf_pq_indexed_oracle_sql(),
    tags=("streaming", "cdc", "similarity", "ivf", "pq", "incremental", "sink"),
)
def q_stream_cdc_ann_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC tail × persisted ANN index composition driver-verified end to
    end (r13) — continuous index maintenance, the ANN sibling of
    ``stream_cdc_semantic_ingest``: an upstream embeddings merge table
    commits v0 (empty bootstrap), v1 (even vec_ids) and v2 (odd), and
    ``run_cdc_ann_index_ingest`` tails the feed — the FIRST delivered
    increment trains centroids + codebook (persisted before any index
    write), every increment assigns-only and upserts its codes, the
    checkpoint advances per version. The probe-only search over the
    committed index must reproduce ``ann_ivf_pq_incremental_state``'s
    frozen-artifact batch oracle VERBATIM — the feed + tail + checkpoint
    machinery is value-invisible."""
    from .operators.similarity import ivf_pq_topk_indexed
    from .sinks.writer import read_merge_state, write_sink
    from .spec import SinkSpec
    from .streaming.ingest import run_cdc_ann_index_ingest

    emb = load(spark, sf_dir, "embeddings")
    root = scratch_dir("q_cdc_ann_")
    up = f"{root}/upstream"
    sink = SinkSpec(
        type="parquet",
        path=up,
        mode="merge",
        merge_key=("vec_id",),
        merge_order=("rev",),
        merge_keep_versions=4,
    )
    write_sink(emb.limit(0).withColumn("rev", F.lit(0)), sink)
    write_sink(
        emb.filter(F.col("vec_id") % 2 == 0).withColumn("rev", F.lit(1)), sink
    )
    write_sink(
        emb.filter(F.col("vec_id") % 2 == 1).withColumn("rev", F.lit(2)), sink
    )
    run_cdc_ann_index_ingest(
        spark, up, ["vec_id"], f"{root}/ann", checkpoint=f"{root}/ckpt"
    )
    return ivf_pq_topk_indexed(
        read_merge_state(spark, f"{root}/ann/index").select(
            "cand_id", "cid", "s", "code"
        ),
        spark.read.parquet(f"{root}/ann/centroids"),
        spark.read.parquet(f"{root}/ann/codebook"),
        emb,
    )


@register(
    "heavy_hitters_tokens",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token ORDER BY n DESC, token LIMIT 20
    """,
    tags=("text", "sketch"),
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provably-exact top-20 tokens at sketch shuffle cost (Space-Saving
    candidates → broadcast-joined exact recount → miss-bound proof;
    operators/sketches.py). Same answer as a plain groupBy top-k (the
    oracle), but the only exchange carries the capacity-bounded candidate
    set + partial counts — never one row per distinct key. The 100 TB
    story: a web-scale token column has 10^9+ distinct keys; vocab_topk's
    full groupBy shuffles all of them, this shuffles ≤ capacity × n_parts."""
    from .operators.sketches import heavy_hitters_exact
    from .operators.text import tokens

    tok = load(spark, sf_dir, "documents").select(
        F.explode(tokens("text")).alias("token")
    )
    return heavy_hitters_exact(tok, "token", k=20, capacity=64)


@register(
    "ann_pq_adc_topk",
    oracle="""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), subs AS (
      SELECT vec_id, s, v[s*16+1 : s*16+16] AS sv
      FROM base, (SELECT unnest(range(4)) AS s)
    ), cb AS (
      SELECT s, vec_id AS code, sv AS cv FROM subs WHERE vec_id < 16
    ), enc_scored AS (
      SELECT t.vec_id, t.s, c.code,
             list_dot_product(t.sv, t.sv)
               - 2 * list_dot_product(t.sv, c.cv)
               + list_dot_product(c.cv, c.cv) AS d
      FROM subs t JOIN cb c USING (s)
    ), enc AS (
      SELECT vec_id, s, code FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id, s ORDER BY d, code) AS rn
        FROM enc_scored
      ) WHERE rn = 1
    ), dtab AS (
      SELECT t.vec_id AS query_id, t.s, c.code,
             CAST(floor((
               list_dot_product(t.sv, t.sv)
                 - 2 * list_dot_product(t.sv, c.cv)
                 + list_dot_product(c.cv, c.cv)
             ) * 1000000 + 0.5) AS BIGINT) AS pdist
      FROM subs t JOIN cb c USING (s)
      WHERE t.vec_id IN (0, 1, 2, 3)
    ), adc AS (
      SELECT d.query_id, e.vec_id AS cand_id, sum(d.pdist) AS ssum
      FROM enc e JOIN dtab d ON e.s = d.s AND e.code = d.code
      WHERE e.vec_id <> d.query_id
      GROUP BY d.query_id, e.vec_id
    )
    SELECT query_id, cand_id, CAST(ssum AS BIGINT) / 1000000.0 AS adc_dist
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY ssum, cand_id) AS rn
      FROM adc
    ) WHERE rn <= 5
    """,
    tags=("similarity", "pq"),
)
def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with asymmetric distance: codes compress the
    corpus 64× (4 bytes vs 256), queries score candidates via a broadcast
    (sub, code) distance table + exact integer sum. The billion-vector
    memory-footprint move IVF alone doesn't give you."""
    from .operators.similarity import pq_adc_topk

    return pq_adc_topk(load(spark, sf_dir, "embeddings"))


from .operators.similarity import (  # noqa: E402
    ivf_kmeans_oracle_sql,
    pq_kmeans_oracle_sql,
)


@register(
    "ann_ivf_kmeans_topk",
    oracle=ivf_kmeans_oracle_sql(),
    tags=("similarity", "ivf", "kmeans"),
)
def q_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with a Lloyd's-TRAINED centroid table (3 fixed iterations)
    instead of the id-prefix stand-in — better-shaped inverted lists, higher
    recall at the same nprobe. Training is pure DataFrame aggregates with
    exactmath centroid means, so the ENTIRE train+search run is verified by
    a generated DuckDB oracle that unrolls the same iterations. Plan shape
    per iteration: broadcast-centroid assignment as a map-side argmin
    aggregate + a k·dim-row mean exchange — corpus shuffles carry one row
    per vector, nothing scales with k·n."""
    from .operators.similarity import ivf_topk

    return ivf_topk(load(spark, sf_dir, "embeddings"), train_iters=3)


@register(
    "ann_pq_kmeans_topk",
    oracle=pq_kmeans_oracle_sql(),
    tags=("similarity", "pq", "kmeans"),
)
def q_ann_pq_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-k with per-subspace k-means codebooks (grouped Lloyd's —
    one independent codebook per subspace in a single pass, the real PQ
    recipe) instead of id-prefix codewords. Same generated-oracle discipline
    as ann_ivf_kmeans_topk; same broadcast/ADC plan shape as
    ann_pq_adc_topk."""
    from .operators.similarity import pq_adc_topk

    return pq_adc_topk(load(spark, sf_dir, "embeddings"), train_iters=3)


@register(
    "scd2_customer_history",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderstatus AS status,
           o_totalprice AS price,
           o_orderdate AS valid_from,
           coalesce(
             strftime(lead(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               '%Y-%m-%d %H:%M:%S'),
             '9999-12-31 00:00:00') AS valid_to,
           (lead(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            IS NULL) AS is_current
    FROM orders
    """,
    tags=("etl", "scd2"),
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: each change record
    gets [valid_from, valid_to) effective dating via lead() over the natural
    change order, open rows flagged current. One window partitioned by the
    dimension key — per-key group size is bounded (a customer's change
    count), so the shuffle is one exchange on o_custkey and no group blows
    up at 100 TB. The standard warehouse upsert-history pattern the
    reference's partitioned-sink pipelines feed into.

    ``valid_to`` is emitted as a formatted STRING, not a timestamp: the
    open-row sentinel 9999-12-31 overflows pandas datetime64[ns] (max 2262)
    in downstream tooling, while the string form is tool-agnostic and sorts
    identically."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").alias("valid_from"),
        F.coalesce(
            F.date_format(nxt, "yyyy-MM-dd HH:mm:ss"),
            F.lit("9999-12-31 00:00:00"),
        ).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "merge_upsert_state",
    oracle="""
    WITH b1 AS (
      SELECT o_custkey AS k, o_orderdate AS v, o_totalprice AS p,
             o_orderkey AS ok
      FROM orders WHERE o_orderkey % 3 = 0
    ), b2 AS (
      SELECT o_custkey AS k, o_orderdate AS v, o_totalprice AS p,
             o_orderkey AS ok
      FROM orders WHERE o_orderkey % 3 = 1
    ), s1 AS (
      SELECT k, v, p, ok FROM (
        SELECT *, row_number() OVER (
          PARTITION BY k ORDER BY v DESC, p DESC, ok DESC) AS rn
        FROM b1
      ) WHERE rn = 1
    ), u AS (
      SELECT k, v, p, ok, 0 AS gen FROM s1
      UNION ALL
      SELECT k, v, p, ok, 1 AS gen FROM b2
    )
    SELECT k, v, p, ok FROM (
      SELECT *, row_number() OVER (
        PARTITION BY k ORDER BY v DESC, gen DESC, p DESC, ok DESC) AS rn
      FROM u
    ) WHERE rn = 1
    """,
    tags=("etl", "sink", "merge"),
)
def q_merge_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verifies the MERGE SINK itself (O10 extended semantics): two
    deterministic order-slices upserted through the real bucket-pruned merge
    sink, then the COMMITTED state read back from disk. The oracle replays
    the two-phase semantics exactly — per-key argmax of
    (merge_order, generation, payload) with batch 2 beating stored state on
    order ties. Round 2 covered this surface with pytest only; this row puts
    the sink's on-disk truth under the hash gate."""

    from .sinks.writer import MERGE_BUCKET_COL, read_merge_state, write_sink
    from .spec import SinkSpec

    o = load(spark, sf_dir, "orders")

    def batch(rem: int) -> DataFrame:
        return o.filter(F.col("o_orderkey") % 3 == rem).select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("v"),
            F.col("o_totalprice").alias("p"),
            F.col("o_orderkey").alias("ok"),
        )

    path = scratch_dir("q_merge_state_") + "/state"
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("v",),
    )
    write_sink(batch(0), sink)
    write_sink(batch(1), sink)
    # pointer-resolved read: _CURRENT → manifest → committed bucket dirs
    return read_merge_state(spark, path).drop(MERGE_BUCKET_COL)


@register(
    "dynamic_overwrite_state",
    oracle="""
    SELECT event_id, event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) + 1 AS cents
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events WHERE event_type <> 'purchase'
    """,
    tags=("etl", "sink", "overwrite"),
)
def q_dynamic_overwrite_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verifies DYNAMIC PARTITION OVERWRITE (O10): a full partitioned
    load, then a re-load of ONE partition (purchases, with a +1-cent marker)
    under partitionOverwriteMode=dynamic. Read-back must show the marker in
    the overwritten partition and the ORIGINAL rows everywhere else — i.e.
    the overwrite replaced exactly one directory. A static overwrite would
    truncate the other partitions and fail the row count; rewriting the
    wrong partition would fail the hash."""

    from .sinks.writer import write_sink
    from .spec import SinkSpec

    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    path = scratch_dir("q_dynover_state_") + "/state"
    write_sink(
        base,
        SinkSpec(type="parquet", path=path, partition_by=("event_type",)),
    )
    write_sink(
        base.filter(F.col("event_type") == "purchase").withColumn(
            "cents", F.col("cents") + 1
        ),
        SinkSpec(
            type="parquet",
            path=path,
            partition_by=("event_type",),
            partition_overwrite="dynamic",
        ),
    )
    return spark.read.parquet(path)


@register(
    "train_val_test_split",
    oracle="""
    SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           count(DISTINCT lang) AS n_langs
    FROM (
      SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS b,
             n_chars, lang
      FROM documents
    )
    GROUP BY 1
    """,
    tags=("sampling", "training"),
)
def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test corpus split via md5(doc_id)
    mod 100 — engine- and partitioning-independent, so the same document
    lands in the same split on every run of every stage (the property random
    splits lose the moment data is re-partitioned). Integer sums only."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars", "lang")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), toks2 AS (
      SELECT doc_id, token FROM toks WHERE token <> ''
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks2 GROUP BY 1, 2
    ), dfreq AS (
      SELECT token, count(DISTINCT doc_id) AS df FROM toks2 GROUP BY 1
    ), n AS (
      SELECT count(*) AS n FROM documents
    )
    SELECT doc_id, token, tfidf_ppm FROM (
      SELECT tf.doc_id, tf.token,
             (tf.tf * n.n * 1000000) // dfreq.df AS tfidf_ppm,
             row_number() OVER (
               PARTITION BY tf.doc_id
               ORDER BY (tf.tf * n.n * 1000000) // dfreq.df DESC, tf.token
             ) AS rn
      FROM tf JOIN dfreq USING (token), n
    ) WHERE rn <= 3
    """,
    tags=("text", "tfidf"),
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms, computed in EXACT integer arithmetic:
    score = tf·N·10^6 div df (parts-per-million, BIGINT) — no log(), no
    doubles, so cross-engine hashes can't wobble. Shape: tf aggregate
    (map-side combinable) shuffle-joined to the document-frequency aggregate
    on token, scalar N broadcast; the ranking window partitions by doc_id
    (bounded group = one doc's vocabulary). At trillion-token scale swap the
    BIGINT score for DECIMAL(38,0) — noted, not needed at any tested SF."""
    d = load(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.expr("tf * n * 1000000 DIV df").alias("tfidf_ppm"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf_ppm").desc(), F.col("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", "tfidf_ppm")
    )


@register(
    "inverted_index_postings",
    oracle="""
    SELECT doc_id, term, count(*) AS tf,
           string_agg(pos::VARCHAR, ',' ORDER BY pos) AS positions
    FROM (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS term,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
      FROM documents
    )
    WHERE term <> ''
    GROUP BY doc_id, term
    """,
    tags=("text", "search"),
)
def q_inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted-index build (the corpus-search structure phrase
    queries and contamination audits need): one posting entry per
    (term, doc) with the 0-based token positions, canonical comma-joined.
    Plan shape: posexplode is a map-only fan-out, then ONE exchange on the
    (doc_id, term) composite for a map-side-combinable count +
    collect_list; positions sort per-group (bounded by a doc's term
    frequency, never corpus-global). At 100 TB the serving step writes
    this table term-bucketed/sorted (the `table` sink's bucketBy layout,
    same decision rule as the pagerank edge table) so a term lookup is
    one pruned bucket scan; the BUILD here is the expensive, shuffled
    part and it carries exactly one exchange."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term")
    ).filter(F.col("term") != "")
    return toks.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list("pos")), lambda x: x.cast("string")),
            ",",
        ).alias("positions"),
    )


from .operators.search import bm25_oracle_sql  # noqa: E402

_BM25_TERMS = ("window", "merge", "scan")


@register(
    "bm25_search_topk",
    oracle=bm25_oracle_sql(_BM25_TERMS),
    tags=("text", "search", "ranking"),
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked retrieval (r13): rational-IDF BM25 top-10 over the documents
    table — the USE side of the index family that `inverted_index_postings`
    builds and `phrase_search_postings` boolean-matches; the primitive
    behind retrieval-based quality filtering, decontamination-by-retrieval
    and hard-negative mining. Exactmath end to end: per-(doc, term)
    contributions floor to integer micro-units under a FIXED IEEE
    parenthesization, per-doc scores are BIGINT sums, and the top-k is a
    TakeOrdered — so the DuckDB oracle replays the value hash exactly (the
    usual ln-IDF is NOT correctly-rounded cross-engine; operators/search.py
    documents the rational-core trade)."""
    from .operators.search import bm25_topk

    return bm25_topk(load(spark, sf_dir, "documents"), _BM25_TERMS)


@register(
    "bm25_lucene_rank",
    oracle=bm25_oracle_sql(_BM25_TERMS, idf="lucene", rank_only=True),
    tags=("text", "search", "ranking", "rank-level"),
)
def q_bm25_lucene_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene-IDF BM25 under DRIVER verification (r16, VERDICT r15 item
    7 — the ``idf="lucene"`` variant was pytest-pinned only): the
    standard ``ln((N - df + 0.5)/(df + 0.5) + 1)`` dampening through the
    ONE shared ``_bm25_contrib`` expression, verified at RANK level —
    ordered ``(rank, doc_id)`` with scores excluded, because ``ln`` is
    not IEEE correctly-rounded cross-engine. The rank claim is made
    PROVABLE rather than probabilistic: per-(doc, term) contributions
    floor to BIGINT micro-units, a 1-ulp ``ln`` disagreement shifts a
    doc's sum by at most |terms| = 3 units, and this row asserts every
    adjacent top-(k+1) gap exceeds 2·|terms| before returning (measured:
    min gap 16 at sf0.001, 445 at sf0.01, 188 at sf0.1) — a corpus where
    ranks COULD flip fails loudly instead of hash-flaking. Same plan
    shape as `bm25_search_topk`; the serving twin is pinned indexed ≡
    inline under either IDF in tests/test_bm25_index.py."""
    from .operators.search import bm25_topk

    k = 10
    guard_margin = 2 * len(_BM25_TERMS)
    top = bm25_topk(
        load(spark, sf_dir, "documents"), _BM25_TERMS, k=k + 1, idf="lucene"
    ).collect()  # k+1 rows — bounded by config, never by corpus
    micro = [int(round(r.bm25 * 1_000_000)) for r in top]
    gaps = [a - b for a, b in zip(micro, micro[1:])]
    if gaps and min(gaps) <= guard_margin:
        raise AssertionError(
            f"bm25_lucene_rank: adjacent micro-unit gap {min(gaps)} <= "
            f"{guard_margin} — ln rounding could flip this ranking; the "
            "rank-level contract does not hold on this corpus"
        )
    return spark.createDataFrame(
        [(i + 1, r.doc_id) for i, r in enumerate(top[:k])],
        "rank int, doc_id long",
    )


@register(
    "phrase_search_postings",
    oracle="""
    SELECT doc_id, n_occ FROM (
      SELECT doc_id,
             len(list_filter(range(1, len(sp)),
                             i -> sp[i] = 'fast' AND sp[i+1] = 'table'))::BIGINT
               AS n_occ
      FROM (SELECT doc_id, string_split(text, ' ') AS sp FROM documents)
    ) WHERE n_occ > 0
    """,
    tags=("text", "search"),
)
def q_phrase_search_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase query — the USE side of the inverted index
    (`inverted_index_postings` is the build side): find documents where
    'fast' is immediately followed by 'table', with the exact occurrence
    count, via position-list adjacency (shift the first term's positions
    by one and intersect). Plan shape: the token explode filters to the
    phrase's terms BEFORE the exchange (postings for 2 terms, not the
    vocabulary), then ONE groupBy(doc_id) builds both position lists as
    conditional collects — no self-join, no second exchange. Against a
    served term-bucketed postings table the same intersection runs on 2
    pruned bucket scans; counting overlapping occurrences stays correct
    where substring-count tricks break (adjacent matches share the
    boundary token). The oracle replays the adjacency scan closed-form
    over DuckDB token arrays."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term")
    ).filter(F.col("term").isin("fast", "table"))
    lists = toks.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.when(F.col("term") == "fast", F.col("pos")))
        ).alias("p_first"),
        F.array_sort(
            F.collect_list(F.when(F.col("term") == "table", F.col("pos")))
        ).alias("p_next"),
    )
    return (
        lists.select(
            "doc_id",
            F.size(
                F.array_intersect(
                    F.transform(F.col("p_first"), lambda x: x + 1), F.col("p_next")
                )
            )
            .cast("long")
            .alias("n_occ"),
        )
        .filter(F.col("n_occ") > 0)
    )


# ---------------------------------------------------------------------------
# Link-graph centrality (crawl-quality weighting for pretraining corpora)
# ---------------------------------------------------------------------------


from .operators.graph import (  # noqa: E402
    event_transition_edges_sql,
    pagerank_cte_sql,
)


@register(
    "graph_pagerank_events",
    oracle=pagerank_cte_sql(event_transition_edges_sql("events"), iters=5),
    tags=("graph", "centrality"),
)
def q_graph_pagerank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-quality centrality: fixed-iteration integer PageRank over the
    event-transition graph (consecutive props.k transitions per user — the
    catalog's crawl-graph stand-in). Exact scaled-BIGINT mass with rational
    damping makes every iteration bit-deterministic, so the DuckDB oracle
    unrolls the 5 iterations and matches the value hash exactly (a float
    PageRank's sum order is irreproducible across engines). Per iteration:
    one equi-join of ranks against the edge list + one keyed sum, all
    shuffles on vertex id — at 100 TB pre-bucket both sides by vertex id
    and every iteration's join is co-located (operators/graph.py)."""
    from .operators.graph import event_transition_edges, pagerank

    return pagerank(event_transition_edges(load(spark, sf_dir, "events")), iters=5)


@register(
    "graph_pagerank_bucketed",
    oracle=pagerank_cte_sql(event_transition_edges_sql("events"), iters=5),
    tags=("graph", "centrality", "bucketed"),
)
def q_graph_pagerank_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_pagerank_events through the PRE-BUCKETED edge layout (r5): the
    distinct edge list is written once as a managed table bucketBy(src) and
    all 5 iterations read its bucket partitioning with zero edge-side
    exchanges (plan-guarded in tests/test_graph.py). Bit-identical ranks —
    SAME oracle as the unbucketed query; the bench pairing measures the
    layout, not the math."""
    from .operators.graph import event_transition_edges, pagerank_bucketed_edges

    return pagerank_bucketed_edges(
        event_transition_edges(load(spark, sf_dir, "events")),
        table="pr_edges_bucketed",
        buckets=8,
        iters=5,
    )


@register(
    "graph_pagerank_dangling",
    oracle=pagerank_cte_sql(
        event_transition_edges_sql("events"), iters=3, redistribute_dangling=True
    ),
    tags=("graph", "centrality"),
)
def q_graph_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagged textbook variant (VERDICT r3 item 8): dangling-node mass
    redistributed uniformly each iteration instead of dropped, for
    normalized-distribution use-cases. The per-iteration dangling sum is a
    1-row broadcast aggregate INSIDE the plan (anti-join + sum — no driver
    collect), and the unrolled DuckDB oracle mirrors it with d{i} CTEs, so
    the value hash pins the redistribution arithmetic bit-exactly."""
    from .operators.graph import event_transition_edges, pagerank

    return pagerank(
        event_transition_edges(load(spark, sf_dir, "events")),
        iters=3,
        redistribute_dangling=True,
    )


# ---------------------------------------------------------------------------
# Data-quality constraint suite (Deequ-style verification pass)
# ---------------------------------------------------------------------------

_DQ_ORACLE = """
    WITH o AS (SELECT
        count(*) FILTER (WHERE o_orderkey IS NULL) AS c_nn,
        count(o_orderkey) - count(DISTINCT o_orderkey) AS c_uq,
        count(*) FILTER (WHERE o_orderstatus IS NOT NULL
                         AND o_orderstatus NOT IN ('O','F','P')) AS c_dom,
        count(*) FILTER (WHERE o_orderpriority IS NOT NULL
                         AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')) AS c_fmt,
        count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0, FALSE)) AS c_pos,
        count(*) AS c_sz
      FROM orders),
    l AS (SELECT
        count(*) FILTER (WHERE l_quantity IS NULL OR l_quantity < 1.0 OR l_quantity > 50.0) AS c_q50,
        count(*) FILTER (WHERE l_quantity IS NULL OR l_quantity < 1.0 OR l_quantity > 40.0) AS c_q40,
        count(*) FILTER (WHERE l_discount IS NULL OR l_discount < 0.0 OR l_discount > 0.1) AS c_disc
      FROM lineitem),
    d AS (SELECT
        count(*) FILTER (WHERE text IS NULL) AS c_nn,
        count(*) FILTER (WHERE NOT coalesce(n_chars = length(text), FALSE)) AS c_len
      FROM documents),
    e AS (SELECT
        count(*) FILTER (WHERE event_type IS NOT NULL
                         AND event_type NOT IN ('click','view','purchase','signup')) AS c_dom
      FROM events),
    m AS (SELECT
        count(*) FILTER (WHERE NOT coalesce(len(embedding) = 64, FALSE)) AS c_dim
      FROM embeddings),
    fk AS (SELECT count(*) AS c FROM lineitem li
           WHERE li.l_orderkey IS NOT NULL
             AND NOT EXISTS (SELECT 1 FROM orders oo
                             WHERE oo.o_orderkey = li.l_orderkey))
    SELECT 'orders_orderkey_not_null' AS constraint_id, 'orders' AS tbl,
           'o_orderkey' AS col, 'not_null' AS kind,
           c_nn::BIGINT AS metric, c_nn <= 0 AS passed FROM o
    UNION ALL SELECT 'orders_orderkey_unique','orders','o_orderkey','unique',
           c_uq::BIGINT, c_uq <= 0 FROM o
    UNION ALL SELECT 'orders_status_domain','orders','o_orderstatus','in_set',
           c_dom::BIGINT, c_dom <= 0 FROM o
    UNION ALL SELECT 'orders_priority_format','orders','o_orderpriority','matches',
           c_fmt::BIGINT, c_fmt <= 0 FROM o
    UNION ALL SELECT 'orders_totalprice_positive','orders','','expr_holds',
           c_pos::BIGINT, c_pos <= 0 FROM o
    UNION ALL SELECT 'orders_nonempty','orders','','size_min',
           c_sz::BIGINT, c_sz >= 1 FROM o
    UNION ALL SELECT 'lineitem_qty_bounds','lineitem','l_quantity','bounds',
           c_q50::BIGINT, c_q50 <= 0 FROM l
    UNION ALL SELECT 'lineitem_qty_le_40','lineitem','l_quantity','bounds',
           c_q40::BIGINT, c_q40 <= 0 FROM l
    UNION ALL SELECT 'lineitem_discount_bounds','lineitem','l_discount','bounds',
           c_disc::BIGINT, c_disc <= 0 FROM l
    UNION ALL SELECT 'lineitem_fk_orders','lineitem','l_orderkey','fk_subset',
           c::BIGINT, c <= 0 FROM fk
    UNION ALL SELECT 'documents_text_not_null','documents','text','not_null',
           c_nn::BIGINT, c_nn <= 0 FROM d
    UNION ALL SELECT 'documents_nchars_consistent','documents','','expr_holds',
           c_len::BIGINT, c_len <= 0 FROM d
    UNION ALL SELECT 'events_type_domain_strict','events','event_type','in_set',
           c_dom::BIGINT, c_dom <= 0 FROM e
    UNION ALL SELECT 'events_type_domain_tolerant','events','event_type','in_set',
           c_dom::BIGINT, c_dom <= 1000000 FROM e
    UNION ALL SELECT 'embeddings_dim64','embeddings','','expr_holds',
           c_dim::BIGINT, c_dim <= 0 FROM m
"""


@register(
    "dq_constraint_report",
    oracle=_DQ_ORACLE,
    tags=("quality", "constraints"),
)
def q_dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality verification pass (Schelter et al., VLDB
    2018 architecture): 15 declarative constraints over 5 tables —
    completeness, uniqueness, value domains, format regex, numeric bounds,
    cross-column consistency, FK containment, minimum size, and a tolerant
    ("at most K bad rows") variant. All of a table's constraints fuse into
    ONE map-side-combinable aggregate pass (one scan per table, 5 scans
    total); the FK check is a single left-anti join. Two constraints FAIL
    by design on the shipped data (quantity cap 40, strict event-type
    domain excluding 'error') so the report demonstrably *catches*
    violations rather than rubber-stamping zeros."""
    from .operators.constraints import Check, constraint_report

    tables = {
        t: load(spark, sf_dir, t)
        for t in ("orders", "lineitem", "documents", "events", "embeddings")
    }
    checks = [
        Check("orders_orderkey_not_null", "orders", "not_null", "o_orderkey"),
        Check("orders_orderkey_unique", "orders", "unique", "o_orderkey"),
        Check("orders_status_domain", "orders", "in_set", "o_orderstatus",
              ("O", "F", "P")),
        Check("orders_priority_format", "orders", "matches", "o_orderpriority",
              ("^[1-5]-[A-Z ]+$",)),
        Check("orders_totalprice_positive", "orders", "expr_holds", None,
              ("o_totalprice > 0",)),
        Check("orders_nonempty", "orders", "size_min", None, (1,)),
        Check("lineitem_qty_bounds", "lineitem", "bounds", "l_quantity",
              (1.0, 50.0)),
        Check("lineitem_qty_le_40", "lineitem", "bounds", "l_quantity",
              (1.0, 40.0)),
        Check("lineitem_discount_bounds", "lineitem", "bounds", "l_discount",
              (0.0, 0.1)),
        Check("lineitem_fk_orders", "lineitem", "fk_subset", "l_orderkey",
              ("orders", "o_orderkey")),
        Check("documents_text_not_null", "documents", "not_null", "text"),
        Check("documents_nchars_consistent", "documents", "expr_holds", None,
              ("n_chars = length(text)",)),
        Check("events_type_domain_strict", "events", "in_set", "event_type",
              ("click", "view", "purchase", "signup")),
        Check("events_type_domain_tolerant", "events", "in_set", "event_type",
              ("click", "view", "purchase", "signup"), tol=1_000_000),
        Check("embeddings_dim64", "embeddings", "expr_holds", None,
              ("size(embedding) = 64",)),
    ]
    return constraint_report(tables, checks)


@register(
    "audio_features_wav",
    oracle="""
    WITH b AS (SELECT doc_id,
        CAST(('0x' || substr(md5(text), 1, 2)) AS INT) AS b1,
        CAST(('0x' || substr(md5(text), 3, 2)) AS INT) AS b2,
        CAST(('0x' || substr(md5(text), 5, 2)) AS INT) AS b3,
        CAST(('0x' || substr(md5(text), 7, 2)) AS INT) AS b4
      FROM documents)
    SELECT doc_id,
      CAST(16000 AS INT) AS sample_rate,
      CAST(16 AS INT) AS n_samples,
      CAST(3*((b1>0)::INT + (b2>0)::INT + (b3>0)::INT + (b4>0)::INT)
         + (b1>0 AND b2>0)::INT + (b2>0 AND b3>0)::INT
         + (b3>0 AND b4>0)::INT AS INT) AS zero_crossings,
      65536::BIGINT * (b1*b1 + b2*b2 + b3*b3 + b4*b4) AS sum_sq,
      CAST(128*greatest(b1, b2, b3, b4) AS INT) AS peak,
      CAST(4*((b1<8)::INT + (b2<8)::INT + (b3<8)::INT + (b4<8)::INT)
           AS INT) AS silence_cnt
    FROM b
    """,
    tags=("multimodal", "audio", "analysis"),
)
def q_audio_features_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio analysis features over REAL decoded PCM: every document's
    generated 16-sample WAV (segment amplitudes = md5 bytes × 128 with
    alternating sign) is decoded and reduced to the standard audio-quality
    screens — strict zero-crossing count, exact integer energy (sum of
    int16 squares), peak magnitude, silence-sample count. The alternating
    encode makes each feature a closed-form function of the md5 bytes
    (3 crossings per live segment + live boundaries; energy 65536·Σb²;
    peak 128·max b; silence 4 per byte < 8), so the whole decode→analyze
    pipeline carries a full value-hash oracle. Map-only at any scale."""
    from .operators.audio import audio_features
    from .operators.multimodal import encode_text_wav

    feat = audio_features(encode_text_wav(load(spark, sf_dir, "documents")))
    return feat.select(
        "doc_id",
        "sample_rate",
        "n_samples",
        "zero_crossings",
        "sum_sq",
        "peak",
        "silence_cnt",
    )


@register(
    "audio_quality_screen",
    oracle="""
    WITH b AS (SELECT doc_id,
        CAST(('0x' || substr(md5(text), 1, 2)) AS INT) AS b1,
        CAST(('0x' || substr(md5(text), 3, 2)) AS INT) AS b2,
        CAST(('0x' || substr(md5(text), 5, 2)) AS INT) AS b3,
        CAST(('0x' || substr(md5(text), 7, 2)) AS INT) AS b4
      FROM documents),
    c AS (SELECT doc_id,
        (b1 >= 192)::INT AS c1, (b2 >= 192)::INT AS c2,
        (b3 >= 192)::INT AS c3, (b4 >= 192)::INT AS c4
      FROM b),
    r AS (SELECT doc_id, c1 + c2 + c3 + c4 AS cs,
        greatest(c1*(1 + c2*(1 + c3*(1 + c4))),
                 c2*(1 + c3*(1 + c4)),
                 c3*(1 + c4),
                 c4) AS mr
      FROM c)
    SELECT doc_id, CAST(16 AS INT) AS n_samples,
           CAST(4*cs AS INT) AS clip_count,
           CAST(4*mr AS INT) AS max_clip_run,
           (4*cs)::DOUBLE / 16 AS clip_ratio,
           4*mr >= 8 AS sustained
    FROM r
    """,
    tags=("multimodal", "audio", "analysis", "quality"),
)
def q_audio_quality_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clipping screen over REAL decoded PCM (VERDICT r7 item 8 — rounding
    out the ASR-prep filter set beyond ZCR/energy/peak/silence): each
    generated WAV's segment amplitude is ``md5_byte · 128``, so a sample
    clips at the 0.75-FS threshold (24576) exactly when its byte ≥ 192 —
    clip_count is 4 per hot byte and the longest run is 4 × the longest
    consecutive hot-byte chain (runs MERGE across segment boundaries
    because the screen tests |v|; the oracle's nested-greatest expression
    enumerates the 4-element chains closed-form). clip_ratio is k/16, a
    binary fraction exact in float; ``sustained`` (run ≥ 8 = two adjacent
    hot segments) is the keep/drop bit an ASR pipeline would filter on.
    Map-only at any scale; the run-length math is a vectorized diff over
    the clip mask (operators/audio.py:clipping_features), no per-sample
    Python."""
    from .operators.audio import audio_quality_screen
    from .operators.multimodal import encode_text_wav

    screen = audio_quality_screen(
        encode_text_wav(load(spark, sf_dir, "documents"))
    )
    return screen.select(
        "doc_id",
        "n_samples",
        "clip_count",
        "max_clip_run",
        (F.col("clip_count").cast("double") / F.col("n_samples")).alias(
            "clip_ratio"
        ),
        (F.col("max_clip_run") >= 8).alias("sustained"),
    )


@register(
    "merge_table_changes",
    oracle="""
    WITH b1 AS (
      SELECT o_custkey AS k, o_orderdate AS v, o_totalprice AS p,
             o_orderkey AS ok
      FROM orders WHERE o_orderkey % 3 = 0
    ), b2 AS (
      SELECT o_custkey AS k, o_orderdate AS v, o_totalprice AS p,
             o_orderkey AS ok
      FROM orders WHERE o_orderkey % 3 = 1
    ), s1 AS (
      SELECT k, v, p, ok FROM (
        SELECT *, row_number() OVER (
          PARTITION BY k ORDER BY v DESC, p DESC, ok DESC) AS rn
        FROM b1
      ) WHERE rn = 1
    ), u AS (
      SELECT k, v, p, ok, 0 AS gen FROM s1
      UNION ALL
      SELECT k, v, p, ok, 1 AS gen FROM b2
    ), s2 AS (
      SELECT k, v, p, ok FROM (
        SELECT *, row_number() OVER (
          PARTITION BY k ORDER BY v DESC, gen DESC, p DESC, ok DESC) AS rn
        FROM u
      ) WHERE rn = 1
    ), upd AS (
      SELECT s1.k AS k, s1.v AS v1, s1.p AS p1, s1.ok AS ok1,
             s2.v AS v2, s2.p AS p2, s2.ok AS ok2
      FROM s1 JOIN s2 ON s1.k = s2.k
      WHERE s1.v IS DISTINCT FROM s2.v OR s1.p IS DISTINCT FROM s2.p
         OR s1.ok IS DISTINCT FROM s2.ok
    )
    SELECT s2.k, s2.v, s2.p, s2.ok, 'insert' AS _change_type
    FROM s2 LEFT JOIN s1 ON s2.k = s1.k WHERE s1.k IS NULL
    UNION ALL
    SELECT k, v1, p1, ok1, 'update_preimage' FROM upd
    UNION ALL
    SELECT k, v2, p2, ok2, 'update_postimage' FROM upd
    """,
    tags=("etl", "sink", "merge", "cdc"),
)
def q_merge_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC change feed over the merge sink (Delta-CDF shape): the same two
    deterministic order-slices as ``merge_upsert_state`` are upserted as
    versions v0 and v1, then ``table_changes(v0 → v1)`` reads ONLY the
    buckets whose manifest directories differ and emits
    insert / update_preimage / update_postimage rows from one full-outer
    join. The oracle replays both snapshots and diffs them logically, so
    the hash pins bucket pruning + join classification end to end (a
    pruning bug that dropped a changed bucket, or a classifier that
    mislabeled an update, flips the hash)."""

    from .sinks.changes import table_changes
    from .sinks.writer import write_sink
    from .spec import SinkSpec

    o = load(spark, sf_dir, "orders")

    def batch(rem: int) -> DataFrame:
        return o.filter(F.col("o_orderkey") % 3 == rem).select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("v"),
            F.col("o_totalprice").alias("p"),
            F.col("o_orderkey").alias("ok"),
        )

    path = scratch_dir("q_merge_changes_") + "/state"
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("v",),
    )
    write_sink(batch(0), sink)
    write_sink(batch(1), sink)
    return table_changes(spark, path, ["k"], from_version=0, to_version=1)


# shared by cdc_per_version_changes (pair-diff recompute) and
# cdc_persisted_changes (materialized changelog read): both build the same
# 3-version merge state, so the SAME logical feed — and therefore the same
# oracle — must come out of either provenance. Two independently-hashed
# driver rows over one oracle IS the bit-equality contract at the driver's
# own verification level (VERDICT r9 item 3).
_CDC_PER_VERSION_ORACLE = """
    WITH d AS (
      SELECT doc_id, n_chars AS val, 0::INT AS mo FROM documents
    ), b1 AS (
      SELECT doc_id, val + 7 AS val, mo FROM d WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id + 10000000 AS doc_id, val, mo FROM d WHERE doc_id % 97 = 0
    ), s1 AS (
      SELECT * FROM b1
      UNION ALL
      SELECT * FROM d WHERE doc_id NOT IN (SELECT doc_id FROM b1)
    ), b2 AS (
      SELECT doc_id, val, mo FROM d WHERE doc_id % 6 = 0
      UNION ALL
      SELECT doc_id, val + 21 AS val, mo FROM d WHERE doc_id % 10 = 1
    ), s2 AS (
      SELECT * FROM b2
      UNION ALL
      SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM b2)
    )
    SELECT b.doc_id, b.val, b.mo, 'insert' AS _change_type, 1::BIGINT AS _commit_version
    FROM s1 b LEFT JOIN d a ON a.doc_id = b.doc_id WHERE a.doc_id IS NULL
    UNION ALL
    SELECT a.doc_id, a.val, a.mo, 'update_preimage', 1::BIGINT
    FROM d a JOIN s1 b ON a.doc_id = b.doc_id
    WHERE a.val IS DISTINCT FROM b.val OR a.mo IS DISTINCT FROM b.mo
    UNION ALL
    SELECT b.doc_id, b.val, b.mo, 'update_postimage', 1::BIGINT
    FROM d a JOIN s1 b ON a.doc_id = b.doc_id
    WHERE a.val IS DISTINCT FROM b.val OR a.mo IS DISTINCT FROM b.mo
    UNION ALL
    SELECT b.doc_id, b.val, b.mo, 'insert', 2::BIGINT
    FROM s2 b LEFT JOIN s1 a ON a.doc_id = b.doc_id WHERE a.doc_id IS NULL
    UNION ALL
    SELECT a.doc_id, a.val, a.mo, 'update_preimage', 2::BIGINT
    FROM s1 a JOIN s2 b ON a.doc_id = b.doc_id
    WHERE a.val IS DISTINCT FROM b.val OR a.mo IS DISTINCT FROM b.mo
    UNION ALL
    SELECT b.doc_id, b.val, b.mo, 'update_postimage', 2::BIGINT
    FROM s1 a JOIN s2 b ON a.doc_id = b.doc_id
    WHERE a.val IS DISTINCT FROM b.val OR a.mo IS DISTINCT FROM b.mo
    """


_CDC_STATE_CACHE: dict[str, str] = {}


def _cdc_three_version_state(spark: SparkSession, sf_dir: str) -> str:
    """The shared 3-version merge state behind the per-version CDC rows:
    v1 updates every third doc and inserts a few new keys; v2 reverts half
    of v1's updates byte-identically (constant ``merge_order`` → incoming
    wins ties) and applies a second update wave. The revert makes the
    per-commit feed provably different from the net endpoint diff.

    Memoized per ``sf_dir`` within a process (r11): the construction is
    deterministic and every consumer treats the state as read-only or
    touches it idempotently (``materialize_changes`` rewrites nothing
    committed), so the four CDC/drift rows share one build — each bench
    entry then prices ITS OWN feature, with the build amortized into the
    first consumer instead of repeated per row."""
    import os

    from .sinks.writer import write_sink
    from .spec import SinkSpec

    cached = _CDC_STATE_CACHE.get(sf_dir)
    if cached is not None and os.path.isdir(cached):
        return cached

    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").alias("val"),
        F.lit(0).cast("int").alias("mo"),
    )
    b1 = (
        d.filter(F.col("doc_id") % 3 == 0)
        .withColumn("val", F.col("val") + 7)
        .unionByName(
            d.filter(F.col("doc_id") % 97 == 0).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"), "val", "mo"
            )
        )
    )
    b2 = d.filter(F.col("doc_id") % 6 == 0).unionByName(
        d.filter(F.col("doc_id") % 10 == 1).withColumn(
            "val", F.col("val") + 21
        )
    )
    path = scratch_dir("q_cdc_per_version_") + "/state"
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("doc_id",),
        merge_order=("mo",),
        # per_version needs every manifest in (0, 2] retained — the default
        # keep=2 would GC v0 when v2 commits
        merge_keep_versions=3,
    )
    for batch in (d, b1, b2):
        write_sink(batch, sink)
    _CDC_STATE_CACHE[sf_dir] = path
    return path


@register(
    "cdc_per_version_changes",
    oracle=_CDC_PER_VERSION_ORACLE,
    tags=("etl", "sink", "merge", "cdc"),
)
def q_cdc_per_version_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-commit CDC granularity (VERDICT r8 item 3, Delta-CDF
    ``table_changes`` semantics): three committed versions, then
    ``table_changes(0 → 2, per_version=True)`` emits adjacent-pair diffs
    tagged ``_commit_version``. The state is built so the per-version feed
    provably differs from the net endpoint diff: v1 updates every third
    doc (and inserts a few new keys), v2 REVERTS half of those updates
    byte-identically to their v0 rows (constant ``merge_order`` → the
    incoming batch wins ties, so the revert lands) and applies a second
    update wave. The reverted keys vanish from a net 0→2 feed but MUST
    appear twice here — once per commit — and the oracle replays all
    three snapshots to pin exactly that. ``use_changelog=False`` pins THIS
    row to the pair-diff recompute provenance (``cdc_persisted_changes``
    pins the materialized one; same oracle — the bit-equality contract)."""
    from .sinks.changes import table_changes

    path = _cdc_three_version_state(spark, sf_dir)
    return table_changes(
        spark,
        path,
        ["doc_id"],
        from_version=0,
        to_version=2,
        per_version=True,
        use_changelog=False,
    )


@register(
    "cdc_persisted_changes",
    oracle=_CDC_PER_VERSION_ORACLE,
    tags=("etl", "sink", "merge", "cdc"),
)
def q_cdc_persisted_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted per-commit change files (VERDICT r9 item 3, Delta CDF's
    ``_change_data`` parity — reference O10's sink contract carried to the
    warehouse feature set): the SAME 3-version state as
    ``cdc_per_version_changes``, but ``materialize_changes`` writes each
    commit's diff once at materialize time and the feed is served with
    ``use_changelog=True`` — a pure pruned parquet scan (zero joins, plan
    width O(1) in range length; plan-guarded in tests/test_plan_quality.py)
    instead of the O(commits) pair-diff recompute. Sharing the oracle with
    the recompute row makes the driver itself verify both provenances
    produce the identical feed (rows + schema + value hash)."""
    from .sinks.changes import materialize_changes, table_changes

    path = _cdc_three_version_state(spark, sf_dir)
    materialize_changes(spark, path, ["doc_id"])
    return table_changes(
        spark,
        path,
        ["doc_id"],
        from_version=0,
        to_version=2,
        per_version=True,
        use_changelog=True,
    )


_SPEC_CDC_SOURCE_ORACLE = f"""
    WITH feed AS ({_CDC_PER_VERSION_ORACLE})
    SELECT doc_id, val, mo, _change_type, _commit_version,
           (_change_type = 'insert') AS is_insert
    FROM feed
    WHERE _change_type <> 'update_preimage'
    """


@register(
    "spec_cdc_source_pipeline",
    oracle=_SPEC_CDC_SOURCE_ORACLE,
    tags=("spec", "etl", "cdc", "front-door"),
)
def q_spec_cdc_source_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC feed as a DECLARATIVE source (VERDICT r10 item 1, closing
    the r9 item 6 deferral): ``in: {type: table_changes, ...}`` through
    ``load_spec → compile_pipeline`` over the same replayed 3-version
    state, with ``use_changelog: true`` pinning the persisted-changelog
    provenance from pure YAML (materialized first — the O(1)-plan-width
    scan path) and the ordinary filter stages composing downstream
    (preimages dropped, an ``is_insert`` enrichment column appended) — a
    warehouse consumer writes zero Python to gate or enrich a feed, the
    reference's config-first UX
    (``TEST/resources/config/embulk_mapred_config.yml``). The oracle
    replays all three snapshots and applies the same stage algebra, so a
    wrong provenance, a mis-parsed spec field, or a stage ordering bug all
    flip the hash."""
    from .plans.compiler import compile_pipeline
    from .sinks.changes import materialize_changes
    from .spec import load_spec

    path = _cdc_three_version_state(spark, sf_dir)
    materialize_changes(spark, path, ["doc_id"])
    return compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "table_changes",
                    "path": path,
                    "keys": ["doc_id"],
                    "from_version": 0,
                    "to_version": 2,
                    "per_version": True,
                    "use_changelog": True,
                },
                "filters": [
                    {
                        "type": "filter",
                        "predicate": "_change_type <> 'update_preimage'",
                    },
                    {
                        "type": "with_column",
                        "name": "is_insert",
                        "expr": "_change_type = 'insert'",
                    },
                ],
                "out": {"type": "null"},
            }
        ),
    )


@register(
    "stream_cdc_tail",
    oracle=_CDC_PER_VERSION_ORACLE,
    tags=("streaming", "etl", "cdc", "front-door"),
)
def q_stream_cdc_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC tail (VERDICT r11 item 3 — the r11 declarative
    ``table_changes`` source wired into the STREAMING front door): the
    same replayed 3-version state consumed by
    ``run_pipeline_streaming``'s rate-limited version-tail loop —
    per-version increments in commit order, each written exactly-once
    under a ``_commit_version=<v>`` dynamic-overwrite partition with a
    checkpointed offset advancing after every commit (retry of a
    half-delivered version REPLACES its partition; see
    ``plans/compiler._run_cdc_tail``). The returned frame is the SINK
    READBACK, not the feed — a wrong increment boundary, a double-applied
    version, or a lost partition all flip the hash. Third provenance
    under the shared per-version oracle: recompute
    (``cdc_per_version_changes``), persisted changelog
    (``cdc_persisted_changes``), and now the streamed delivery must all
    be bit-equal. At 100 TB each increment is one commit's changes
    (changed-bucket pruned) and per-poll driver work is one pointer
    read — the tail's cost scales with change volume, never state size."""
    from .plans.compiler import run_pipeline_streaming
    from .spec import load_spec

    state = _cdc_three_version_state(spark, sf_dir)
    root = scratch_dir("q_stream_cdc_tail_")
    run_pipeline_streaming(
        spark,
        load_spec(
            {
                "in": {
                    "type": "table_changes",
                    "path": state,
                    "keys": ["doc_id"],
                    "from_version": 0,
                    "to_version": 2,
                    "per_version": True,
                    "options": {"checkpoint": f"{root}/ck"},
                },
                "out": {"type": "parquet", "path": f"{root}/out"},
            }
        ),
    )
    return spark.read.parquet(f"{root}/out").select(
        "doc_id",
        "val",
        "mo",
        "_change_type",
        # discovered partition column (int) → the feed's long
        F.col("_commit_version").cast("long").alias("_commit_version"),
    )


@register(
    "spec_merge_state_read",
    oracle="""
    WITH d AS (
      SELECT doc_id, n_chars AS val, 0::INT AS mo FROM documents
    ), b1 AS (
      SELECT doc_id, val + 7 AS val, mo FROM d WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id + 10000000 AS doc_id, val, mo FROM d WHERE doc_id % 97 = 0
    ), s1 AS (
      SELECT * FROM b1
      UNION ALL
      SELECT * FROM d WHERE doc_id NOT IN (SELECT doc_id FROM b1)
    )
    SELECT doc_id, val, mo, val % 10 AS val_mod FROM s1
    """,
    tags=("spec", "etl", "merge", "time-travel", "front-door"),
)
def q_spec_merge_state_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative merge-state read-back with TIME TRAVEL (r12): `in:
    {type: merge_state, options: {version: 1}}` resolves the state's
    _CURRENT pointer → the v1 manifest → an explicit bucket-dir scan
    (sinks/writer.read_merge_state — a plain `type: parquet` scan of a
    pointer-era state sees ZERO files and is rejected loudly), then the
    ordinary filter surface composes downstream. Reads the SAME memoized
    3-version state as the CDC rows at its POST-v1 snapshot, so the
    oracle replays exactly batch-1-over-base — a pointer bug, a manifest
    pointing at stale buckets, or time-travel off by one commit all flip
    the hash. At 100 TB: the read lists only the manifest's bucket dirs
    (O(buckets) metadata), never the whole state root; retained versions
    are immutable, so a training job pinned to options.version is
    bit-reproducible for the retention window."""
    from .plans.compiler import compile_pipeline
    from .spec import load_spec

    path = _cdc_three_version_state(spark, sf_dir)
    return compile_pipeline(
        spark,
        load_spec(
            {
                "in": {
                    "type": "merge_state",
                    "path": path,
                    "options": {"version": 1},
                },
                "filters": [
                    {
                        "type": "with_column",
                        "name": "val_mod",
                        "expr": "val % 10",
                    }
                ],
                "out": {"type": "null"},
            }
        ),
    )


@register(
    "spec_anti_state_pipeline",
    oracle="""
    SELECT source, count(*)::BIGINT AS n,
           sum(doc_id + 10000000)::BIGINT AS sum_id
    FROM documents WHERE doc_id % 97 <> 0 GROUP BY source
    """,
    tags=("spec", "dedup", "runtimefilter", "incremental", "front-door"),
)
def q_spec_anti_state_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion front door from pure YAML (r12 cont.): the
    `anti_state` filter stage drops delta rows whose key already exists
    in a landed merge state, through the bloom-bitmap runtime prefilter
    (operators/runtimefilter.py — exact result, probe-negative rows never
    enter the state join). The delta here is the documents table with
    keys shifted by 10M, which collides with EXACTLY the state's
    v1-inserted `doc_id + 10M (doc_id % 97 = 0)` keys — a mostly-new
    delta with a thin overlap, the prefilter's design regime. The oracle
    replays the state's final keyset closed-form (base doc_ids never
    collide with the shifted delta at any tested SF: doc_id < 10M), so a
    bitmap false NEGATIVE (dropped new row), a verify-join bug (kept
    present row), or a stage-wiring bug all flip the hash. Downstream
    the ordinary aggregate stage composes — the whole chain is config."""
    from .plans.compiler import compile_pipeline
    from .spec import load_spec

    path = _cdc_three_version_state(spark, sf_dir)
    return compile_pipeline(
        spark,
        load_spec(
            {
                "in": {"type": "parquet", "path": f"{sf_dir}/documents.parquet"},
                "filters": [
                    {"type": "select", "columns": ["doc_id", "source"]},
                    {
                        "type": "with_column",
                        "name": "doc_id",
                        "expr": "doc_id + 10000000",
                    },
                    {
                        "type": "anti_state",
                        "state": {"type": "merge_state", "path": path},
                        "keys": ["doc_id"],
                        # spec-declared sizing (manifest/table stats at
                        # scale) — no eager count at compile time
                        "expected_keys": 8192,
                    },
                    {
                        "type": "aggregate",
                        "group_by": ["source"],
                        "aggs": {"n": "count(*)", "sum_id": "sum(doc_id)"},
                    },
                ],
                "out": {"type": "null"},
            }
        ),
    )


_CDC_DRIFT_ORACLE = """
    WITH ins AS (
      SELECT count(*)::BIGINT AS n FROM documents WHERE doc_id % 97 = 0
    )
    SELECT 'rows' AS constraint_id, 'state' AS tbl, '' AS col,
           'row_delta' AS kind, 1::BIGINT AS _commit_version,
           (SELECT n FROM ins) AS metric, (SELECT n FROM ins) = 0 AS passed
    UNION ALL
    SELECT 'rows', 'state', '', 'row_delta', 2::BIGINT, 0::BIGINT, TRUE
    UNION ALL
    SELECT 'nulls', 'state', 'val', 'null_delta', 1::BIGINT, 0::BIGINT, TRUE
    UNION ALL
    SELECT 'nulls', 'state', 'val', 'null_delta', 2::BIGINT, 0::BIGINT, TRUE
    """


@register(
    "cdc_drift_report",
    oracle=_CDC_DRIFT_ORACLE,
    tags=("etl", "cdc", "quality", "drift"),
)
def q_cdc_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-version drift checks over the 3-version CDC state (VERDICT
    r10 item 6 — the last r10 module surface without its own driver row):
    ``row_delta`` bounds (0, 0) catch v1's inserts (every ``doc_id % 97``
    key → metric > 0, ``passed`` false) while v2's pure update wave nets 0
    and passes; ``null_delta`` on ``val`` stays 0 for both commits (no
    null flips exist in this state — the closed-form zero IS the
    expectation, pinned by the oracle). The feed is served from the
    persisted changelog (materialize + ``use_changelog=True``), so the
    whole driver plan is a pruned ``_changelog/`` scan into ONE fused
    ``groupBy(_commit_version)`` pass — N checks = one map-side-combinable
    exchange, plan-guarded in tests/test_plan_quality.py. The closed-form
    oracle derives both commits' metrics from the documents table
    directly (v1 row_delta = the insert count; everything else 0)."""
    from .operators.constraints import Check, drift_report
    from .sinks.changes import materialize_changes, table_changes

    path = _cdc_three_version_state(spark, sf_dir)
    materialize_changes(spark, path, ["doc_id"])
    feed = table_changes(
        spark,
        path,
        ["doc_id"],
        from_version=0,
        to_version=2,
        per_version=True,
        use_changelog=True,
    )
    return drift_report(
        feed,
        [
            Check("rows", "state", "row_delta", params=(0, 0)),
            Check("nulls", "state", "null_delta", column="val", params=(0, 0)),
        ],
    )


@register(
    "url_canonical_dedup",
    oracle="""
    WITH d AS (SELECT doc_id, doc_id % 100 AS g FROM documents),
    c AS (SELECT g, min(doc_id) AS keep_doc_id, count(*) AS n_dups
          FROM d GROUP BY g),
    u AS (SELECT g, keep_doc_id, n_dups,
        CASE WHEN g % 2 = 0 THEN 'http' ELSE 'https' END AS scheme,
        'src' || (g % 5) || '.' ||
          CASE g % 3 WHEN 0 THEN 'example.com'
                     WHEN 1 THEN 'sample.co.uk'
                     ELSE 'data.org' END AS host,
        CASE g % 3 WHEN 0 THEN 'example.com'
                   WHEN 1 THEN 'sample.co.uk'
                   ELSE 'data.org' END AS registrable_domain,
        CASE WHEN g % 7 = 0 THEN ':8080' ELSE '' END AS port,
        CASE WHEN g % 6 = 5 THEN '/' ELSE '/p' || (g % 6) || '/x' END AS pth,
        CASE WHEN g % 4 = 0 THEN 'a=2&id=' || g || '&z=1'
             ELSE 'id=' || g END AS q
      FROM c),
    canon AS (SELECT registrable_domain, host,
        scheme || '://' || host || port || pth || '?' || q AS canon_url,
        keep_doc_id, n_dups FROM u),
    r AS (SELECT *, row_number() OVER (
            PARTITION BY registrable_domain
            ORDER BY md5(keep_doc_id::VARCHAR), keep_doc_id) AS rn
          FROM canon)
    SELECT registrable_domain, host, canon_url, keep_doc_id,
           n_dups::BIGINT AS n_dups, rn::INT AS domain_rank,
           rn <= 5 AS kept
    FROM r
    """,
    tags=("web", "dedup", "url"),
)
def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus URL pipeline front door: canonicalize → exact-dedup on
    the canonical URL → deterministic per-registrable-domain cap. Each
    document is assigned a deliberately MESSY surface URL (uppercase
    scheme/host, redundant default ports, duplicate slashes, trailing
    slashes, unsorted query params, utm_*/gclid/bare-fbclid tracking noise,
    fragments) whose canonical form is a closed-form function of
    ``doc_id % 100`` — so the oracle constructs the expected canonical URL
    directly while the Spark side must actually parse and normalize every
    surface variant (``operators/web.py``: pure regexp/array expressions,
    whole-stage codegen, map-only). Dedup then keys on ``canon_url``
    (md5-groupBy, lowest doc_id survives — `exact_dedup` composition) and
    the per-domain cap is the `sample_k_per_group` hash-ordered window.
    At 100 TB: one partial-aggregatable exchange on the canonical hash;
    the cap window runs over the DEDUPED group table (orders of magnitude
    below corpus size) partitioned by domain — for mega-domains holding
    >10^7 canonical URLs each, swap the rank window for the
    `quality_prune_per_source` counts+hash-boundary pattern, which never
    total-orders a partition. Plan audit: ReadSchema=doc_id only, 2
    exchanges, zero Python nodes."""
    from .operators.web import url_canonicalize

    d = load(spark, sf_dir, "documents").select("doc_id")
    g = (F.col("doc_id") % 100).cast("long")
    gs = g.cast("string")
    scheme_l = F.when(g % 2 == 0, F.lit("http")).otherwise(F.lit("https"))
    domain = (
        F.when(g % 3 == 0, F.lit("example.com"))
        .when(g % 3 == 1, F.lit("sample.co.uk"))
        .otherwise(F.lit("data.org"))
    )
    host_l = F.concat(F.lit("src"), (g % 5).cast("string"), F.lit("."), domain)
    v = (F.col("doc_id") % 4).cast("int")
    scheme_s = F.when(v == 1, F.upper(scheme_l)).otherwise(scheme_l)
    host_s = F.when(v == 2, F.upper(host_l)).otherwise(host_l)
    port_s = (
        F.when(g % 7 == 0, F.lit(":8080"))
        .when(
            v == 1,
            F.when(scheme_l == "http", F.lit(":80")).otherwise(F.lit(":443")),
        )
        .otherwise(F.lit(""))
    )
    path_l = F.when(g % 6 == 5, F.lit("")).otherwise(
        F.concat(F.lit("/p"), (g % 6).cast("string"), F.lit("/x"))
    )
    path_s = (
        F.when(v == 1, F.regexp_replace(path_l, "/", "//"))
        .when((v == 2) | (v == 3), F.concat(path_l, F.lit("/")))
        .otherwise(path_l)
    )
    query_l = F.when(
        g % 4 == 0, F.concat(F.lit("z=1&id="), gs, F.lit("&a=2"))
    ).otherwise(F.concat(F.lit("id="), gs))
    query_s = F.concat(
        F.when(v == 0, F.lit("utm_source=x&")).otherwise(F.lit("")),
        query_l,
        F.when(v == 2, F.lit("&gclid=123"))
        .when(v == 3, F.lit("&fbclid"))
        .otherwise(F.lit("")),
    )
    frag_s = F.when(v % 2 == 1, F.lit("#sec")).otherwise(F.lit(""))
    url = F.concat(
        scheme_s, F.lit("://"), host_s, port_s, path_s,
        F.lit("?"), query_s, frag_s,
    )
    canon = url_canonicalize(d.withColumn("url", url))
    groups = canon.groupBy("canon_url", "host", "registrable_domain").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count("*").alias("n_dups"),
    )
    w = W.partitionBy("registrable_domain").orderBy(
        F.md5(F.col("keep_doc_id").cast("string")), F.col("keep_doc_id")
    )
    return groups.withColumn("domain_rank", F.row_number().over(w)).select(
        "registrable_domain",
        "host",
        "canon_url",
        "keep_doc_id",
        "n_dups",
        "domain_rank",
        (F.col("domain_rank") <= 5).alias("kept"),
    )


@register(
    "url_registrable_psl",
    oracle="""
    WITH d AS (SELECT doc_id, doc_id % 14 AS g FROM documents),
    h AS (SELECT doc_id,
        CASE g % 7
          WHEN 0 THEN 'src' || g || '.example.gov.uk'
          WHEN 1 THEN 'src' || g || '.b.example.co.uk'
          WHEN 2 THEN 'src' || g || '.apps.github.io'
          WHEN 3 THEN 'src' || g || '.www.data.org'
          WHEN 4 THEN 'src' || g || '.example.com'
          WHEN 5 THEN 'gov.uk'
          ELSE 'src' || g || '.example.internal' END AS host,
        CASE g % 7
          WHEN 0 THEN 'example.gov.uk'
          WHEN 1 THEN 'example.co.uk'
          WHEN 2 THEN 'apps.github.io'
          WHEN 3 THEN 'data.org'
          WHEN 4 THEN 'example.com'
          WHEN 5 THEN 'gov.uk'
          ELSE 'src' || g || '.example.internal' END AS reg
      FROM d)
    SELECT host, reg AS registrable_domain_psl,
           count(*)::BIGINT AS n_docs, min(doc_id) AS min_doc_id
    FROM h GROUP BY host, reg
    """,
    tags=("web", "url", "psl"),
)
def q_url_registrable_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Public-Suffix-List registrable domain under a driver oracle
    (VERDICT r7 item 4): hosts are a closed-form function of ``doc_id % 14``
    chosen so the 2-label heuristic gets them WRONG while the PSL
    longest-suffix join gets them right — multi-label public suffixes
    (``a.example.gov.uk`` → ``example.gov.uk``, not ``gov.uk``),
    private-domain-style suffixes (``x.apps.github.io`` → ``apps.github.io``),
    a host that IS a public suffix (``gov.uk`` → itself), and a TLD absent
    from the table (``.internal`` → whole host, the left-join NULL branch).
    The suffix table is an in-query fixture standing in for the real PSL
    data file (``operators/web.py`` docstring: the PSL is data, the
    broadcast join is the algorithm). The oracle computes the expected
    registrable domain closed-form, so any regression in the in-plan suffix
    expansion, the longest-match ``max_by``, or the boundary branches flips
    the value hash. At 100 TB: the PSL is ~10k rows broadcast; the suffix
    explode is bounded at ``max_labels`` rows per DISTINCT host and the
    groupBys are partial-aggregatable — one broadcast hash join, no
    corpus-sized shuffle beyond the host rollup."""
    from .operators.web import registrable_domain_psl

    d = load(spark, sf_dir, "documents").select("doc_id")
    g = (F.col("doc_id") % 14).cast("long")
    gs = g.cast("string")
    cls = (g % 7).cast("int")
    src = F.concat(F.lit("src"), gs, F.lit("."))
    host = (
        F.when(cls == 0, F.concat(src, F.lit("example.gov.uk")))
        .when(cls == 1, F.concat(src, F.lit("b.example.co.uk")))
        .when(cls == 2, F.concat(src, F.lit("apps.github.io")))
        .when(cls == 3, F.concat(src, F.lit("www.data.org")))
        .when(cls == 4, F.concat(src, F.lit("example.com")))
        .when(cls == 5, F.lit("gov.uk"))
        .otherwise(F.concat(src, F.lit("example.internal")))
    )
    psl = spark.createDataFrame(
        [("com",), ("org",), ("io",), ("uk",), ("co.uk",), ("gov.uk",),
         ("github.io",)],
        "suffix string",
    )
    out = registrable_domain_psl(d.withColumn("host", host), psl)
    return out.groupBy("host", "registrable_domain_psl").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
    )


#: memoized per sf_dir (the `_ivf_pq_persisted_index` convention): the
#: serving row prices PROBE-ONLY scoring, so the one-time whole-corpus
#: postings build happens on the first call only
_BM25_INDEX_CACHE: dict[str, str] = {}


def _bm25_persisted_index(spark: SparkSession, sf_dir: str) -> str:
    cached = _BM25_INDEX_CACHE.get(sf_dir)
    if cached:
        return cached
    from .operators.search import bm25_index_build

    root = scratch_dir("q_bm25_index_")
    bm25_index_build(load(spark, sf_dir, "documents"), root)
    _BM25_INDEX_CACHE[sf_dir] = root
    return root


@register(
    "bm25_search_indexed",
    oracle=bm25_oracle_sql(_BM25_TERMS),
    tags=("text", "search", "ranking", "serving", "sink"),
)
def q_bm25_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served PROBE-ONLY from the persisted postings index (r14,
    VERDICT r13 item 1 — the lexical twin of `ann_ivf_pq_index_probe`):
    the committed standing state is the term-bucketed tombstone-capable
    `(term, doc_id, tf, dl)` merge-sink postings plus per-version corpus
    stats deltas; the query opens ONLY the query terms' bucket
    directories (`merge_bucket_ids` → `read_merge_state(buckets=...)`),
    pushes `term IN (...)` to the parquet scan (PushedFilters,
    plan-guarded), takes df from the probed rows themselves and N/Σdl
    from the stats — the corpus is never tokenized, scanned, or joined
    at query time. Same oracle as `bm25_search_topk` VERBATIM: a
    whole-corpus index must reproduce the inline scorer bit-for-bit
    (`_bm25_contrib` is the ONE shared float-discipline expression).
    The bench gap between the two rows is what the standing index buys a
    repeat query — re-tokenizing 100 TB per query batch vs reading
    |terms| inverted lists."""
    from .operators.search import bm25_topk_indexed

    root = _bm25_persisted_index(spark, sf_dir)
    return bm25_topk_indexed(spark, root, _BM25_TERMS)


@register(
    "stream_cdc_postings_ingest",
    oracle=bm25_oracle_sql(_BM25_TERMS),
    tags=("streaming", "cdc", "text", "search", "incremental", "sink"),
)
def q_stream_cdc_postings_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC tail × persisted postings index driver-verified end to end
    (r14, VERDICT r13 item 3) — the lexical sibling of
    `stream_cdc_ann_index_ingest`: an upstream documents merge table
    commits v0 (empty bootstrap), v1 (even doc_ids), v2 (odd), v3 (an
    identical re-commit whose diff is EMPTY — the no-op increment the
    tail must skip without writing an empty stats dir or a no-op
    postings version), and ``run_cdc_postings_ingest`` tails the feed —
    each increment re-tokenizes its postimage rows into postings upserts
    and its own stats delta, checkpoint advancing per version. Probe-only
    search over the maintained index must reproduce the INLINE scorer's
    oracle VERBATIM over the whole corpus — the feed + tail + checkpoint
    machinery is value-invisible. The churn half (updates retiring
    dropped terms, upstream keyed-DELETE cascading to tombstones) is
    pinned in tests/test_bm25_index.py + test_cdc_postings_compose.py."""
    from .operators.search import bm25_topk_indexed
    from .sinks.writer import write_sink
    from .spec import SinkSpec
    from .streaming.ingest import run_cdc_postings_ingest

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    up = scratch_dir("q_cdc_postings_up_") + "/upstream"
    sink = SinkSpec(
        type="parquet",
        path=up,
        mode="merge",
        merge_key=("doc_id",),
        merge_order=("rev",),
        merge_keep_versions=5,
    )
    rev = F.lit(0).cast("long").alias("rev")
    write_sink(docs.limit(0).withColumn("rev", F.lit(0).cast("long")), sink)
    evens = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text", rev)
    write_sink(evens, sink)
    write_sink(
        docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text", rev),
        sink,
    )
    # identical re-commit of a deterministic subset → EMPTY diff at v3
    write_sink(evens.filter(F.col("doc_id") % 20 == 0), sink)
    root = scratch_dir("q_cdc_postings_ix_")
    run_cdc_postings_ingest(
        spark, up, ["doc_id"], root,
        checkpoint=scratch_dir("q_cdc_postings_ck_"),
    )
    return bm25_topk_indexed(spark, root, _BM25_TERMS)


#: the batch-retrieval fixture: three query term sets over the synthetic
#: vocabulary (shared by the row and its oracle — config, not data)
_BM25_BATCH_QUERIES = {
    0: ("window", "merge", "scan"),
    1: ("filter", "join"),
    2: ("hash", "sort", "stream", "table"),
}

from .operators.search import (  # noqa: E402
    bm25_batch_oracle_sql,
)


@register(
    "bm25_batch_search_indexed",
    oracle=bm25_batch_oracle_sql(_BM25_BATCH_QUERIES),
    tags=("text", "search", "ranking", "serving", "batch"),
)
def q_bm25_batch_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH retrieval over the persisted postings index (r14) — the
    decontamination-by-retrieval / hard-negative-mining shape: MANY query
    term sets scored in ONE pass, each term's inverted list read once for
    the whole batch (not once per query). One bucket-pruned probe covers
    the union of all queries' terms; the (query_id, term) mapping and the
    per-term df ride as broadcasts; the per-(query, doc) sums exchange
    once; the top-k window is PARTITIONED BY query_id (parallel across
    queries, never a global sort). Each query's ranking is bit-equal to
    its own single-query probe (shared `_bm25_contrib`, pinned in
    pytest); the oracle replays all three queries from the raw corpus.
    At 100 TB with 10k benchmark questions this is the difference between
    |union terms| inverted-list reads and 10k corpus passes."""
    from .operators.search import bm25_batch_topk_indexed

    root = _bm25_persisted_index(spark, sf_dir)
    return bm25_batch_topk_indexed(spark, root, _BM25_BATCH_QUERIES)


@register(
    "hybrid_rrf_search",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
    ), stats AS (
      SELECT count(*) AS n, sum(dl) AS sumdl FROM dl
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN ('window', 'merge', 'scan') GROUP BY doc_id, term
    ), dfq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), contrib AS (
      SELECT t.doc_id,
             CAST(floor(
               ((s.n - d.df + 0.5) / (d.df + 0.5))
               * ((t.tf * 2.2)
                  / (t.tf + 1.2 * (0.25 + 0.75 * (l.dl * s.n) / s.sumdl)))
               * 1000000.0 + 0.5
             ) AS BIGINT) AS c
      FROM tf t JOIN dfq d USING (term) JOIN dl l USING (doc_id), stats s
    ), lex AS (
      SELECT doc_id, row_number() OVER (ORDER BY smicro DESC, doc_id) AS rank
      FROM (SELECT doc_id, sum(c) AS smicro FROM contrib GROUP BY doc_id)
      ORDER BY rank LIMIT 20
    ), base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), qv AS (
      SELECT v AS qv FROM base WHERE vec_id = 0
    ), sem AS (
      SELECT doc_id, row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS rank
      FROM (
        SELECT c.vec_id AS doc_id,
               floor((
                 list_dot_product(q.qv, c.v)
                 / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(c.v, c.v)))
               ) * 1000000 + 0.5) / 1000000.0 AS cos_sim
        FROM qv q, base c WHERE c.vec_id <> 0
      ) ORDER BY rank LIMIT 20
    ), fused AS (
      SELECT doc_id, sum(CAST(floor(1000000.0 / (60 + rank)) AS BIGINT)) AS rrf_micro
      FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)
      GROUP BY doc_id
    )
    SELECT doc_id, CAST(rrf_micro AS BIGINT) / 1000000.0 AS rrf FROM (
      SELECT *, row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS rn
      FROM fused
    ) WHERE rn <= 10
    """,
    tags=("text", "search", "similarity", "hybrid", "ranking"),
)
def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID lexical+semantic retrieval via Reciprocal Rank Fusion (r14;
    Cormack, Clarke & Büttcher, SIGIR 2009 — the standard combiner in
    production hybrid search): the BM25 top-20 for the benchmark terms
    and the exact-cosine top-20 for query vector 0 (the testdata's
    embeddings table is keyed by the same ids as documents — vec_id ≡
    doc_id) fuse by Σ floor(1e6/(60+rank)) in exact BIGINT micro-units.
    Why a training-data pipeline wants it: decontamination and
    hard-negative mining both miss matches that only one modality
    surfaces — lexical catches verbatim/near-verbatim overlap that
    embedding neighborhoods smear, embeddings catch paraphrases lexical
    scoring misses; RRF needs no score calibration between the two
    (rank-only). Both inputs are the engine's own oracled rows, the
    fusion runs on two top-k-bounded (broadcast-sized) frames, and the
    oracle replays rankings + fusion end to end."""
    from pyspark.sql import Window

    from .operators.search import bm25_topk, rrf_fuse
    from .operators.similarity import brute_force_topk

    lex = bm25_topk(load(spark, sf_dir, "documents"), _BM25_TERMS, k=20)
    lex_rank = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id")))
        .alias("rank"),
    )
    sem = brute_force_topk(
        load(spark, sf_dir, "embeddings"), query_ids=(0,), k=20
    )
    sem_rank = sem.select(
        F.col("cand_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.col("cos_sim").desc(), F.col("cand_id")))
        .alias("rank"),
    )
    return rrf_fuse([lex_rank, sem_rank], k=10)


#: memoized per sf_dir: one tombstone-bearing merge state shared by the
#: live-read row and the CDC-classification row (the
#: `_cdc_three_version_state` amortization pattern)
_DELETE_STATE_CACHE: dict[str, str] = {}


def _merge_delete_versions(spark: SparkSession, sf_dir: str) -> str:
    """Three committed versions of a customer-keyed merge state with keyed
    DELETEs (r14, VERDICT r13 item 2): v0 seeds ``c_custkey % 4 == 0``;
    v1 upserts ``% 8 == 0`` (+500 cents), inserts ``% 4 == 1``, tombstones
    ``% 8 == 4`` (retire) AND ``% 8 == 3`` (never present — must be a
    no-op); v2 re-inserts half the retired keys (``% 16 == 4``, +1000
    cents). Every payload is a closed-form function of c_custkey, so both
    rows' oracles replay it from the raw table."""
    cached = _DELETE_STATE_CACHE.get(sf_dir)
    if cached:
        return cached
    from .sinks.writer import write_sink
    from .spec import SinkSpec

    c = load(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    k = F.col("c_custkey")

    def batch(pred, cents_expr, rev, dead):
        return c.filter(pred).select(
            k.alias("k"),
            cents_expr.alias("cents"),
            F.lit(rev).cast("long").alias("rev"),
            F.lit(dead).alias("_deleted"),
        )

    path = scratch_dir("q_merge_delete_") + "/state"
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("rev",),
        merge_keep_versions=4,
        delete_column="_deleted",
    )
    write_sink(batch(k % 4 == 0, cents, 0, False), sink)
    write_sink(
        batch(k % 8 == 0, cents + 500, 1, False)
        .unionByName(batch(k % 4 == 1, cents, 1, False))
        .unionByName(batch(k % 8 == 4, cents, 1, True))
        .unionByName(batch(k % 8 == 3, cents, 1, True)),
        sink,
    )
    write_sink(batch(k % 16 == 4, cents + 1000, 2, False), sink)
    _DELETE_STATE_CACHE[sf_dir] = path
    return path


@register(
    "merge_delete_state",
    oracle="""
    WITH cents AS (
      SELECT c_custkey AS k,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS c
      FROM customer
    )
    SELECT k, c + 500 AS cents, CAST(1 AS BIGINT) AS rev
    FROM cents WHERE k % 8 = 0
    UNION ALL
    SELECT k, c AS cents, CAST(1 AS BIGINT) AS rev
    FROM cents WHERE k % 4 = 1
    UNION ALL
    SELECT k, c + 1000 AS cents, CAST(2 AS BIGINT) AS rev
    FROM cents WHERE k % 16 = 4
    """,
    tags=("etl", "sink", "merge", "delete"),
)
def q_merge_delete_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed DELETE through the merge sink (r14, VERDICT r13 item 2 — the
    right-to-be-forgotten path): tombstone upserts
    (``SinkSpec.delete_column``) retire keys through the SAME bucket-pruned
    keyed argmax as ordinary upserts — a replayed old batch can never
    resurrect a newer delete — and the committed LIVE view is read back
    with ``read_merge_state(..., delete_col=...)``. The replay: v0 seeds
    ``% 4 == 0``; v1 updates ``% 8 == 0``, inserts ``% 4 == 1``, retires
    ``% 8 == 4`` and no-op-tombstones the never-present ``% 8 == 3``; v2
    re-inserts ``% 16 == 4``. The oracle computes the surviving live set
    closed-form: any key wrongly dropped (the no-op tombstone), wrongly
    retained (``% 16 == 12`` must stay dead), or resurrected at a stale
    payload flips the hash. At 100 TB a delete batch costs one touched-
    bucket rewrite, never a snapshot rewrite; tombstone reclamation is
    ``purge_tombstones`` on the gc-grace schedule (pytest-covered —
    purge commits diff empty, so it is value-invisible here)."""
    from .sinks.writer import read_merge_state

    path = _merge_delete_versions(spark, sf_dir)
    return read_merge_state(spark, path, delete_col="_deleted").select(
        "k", "cents", "rev"
    )


@register(
    "cdc_delete_feed",
    oracle="""
    WITH cents AS (
      SELECT c_custkey AS k,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS c
      FROM customer
    )
    SELECT k, c AS cents, CAST(0 AS BIGINT) AS rev,
           'update_preimage' AS change_type, CAST(1 AS BIGINT) AS commit_version
    FROM cents WHERE k % 8 = 0
    UNION ALL
    SELECT k, c + 500, CAST(1 AS BIGINT), 'update_postimage', CAST(1 AS BIGINT)
    FROM cents WHERE k % 8 = 0
    UNION ALL
    SELECT k, c, CAST(1 AS BIGINT), 'insert', CAST(1 AS BIGINT)
    FROM cents WHERE k % 4 = 1
    UNION ALL
    SELECT k, c, CAST(0 AS BIGINT), 'delete', CAST(1 AS BIGINT)
    FROM cents WHERE k % 8 = 4
    UNION ALL
    SELECT k, c + 1000, CAST(2 AS BIGINT), 'insert', CAST(2 AS BIGINT)
    FROM cents WHERE k % 16 = 4
    """,
    tags=("cdc", "merge", "delete"),
)
def q_cdc_delete_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC half of the keyed-DELETE contract (r14): the per-version
    ``table_changes(..., delete_col=...)`` feed over the tombstone-bearing
    state classifies every transition in the logical language —
    live→tombstone is a ``delete`` carrying the key's last LIVE payload
    (the v0 row, not the tombstone's), re-insert is an ``insert``, a
    tombstone for a never-present key (``% 8 == 3``) produces NOTHING,
    and the marker column never leaks into the feed. Downstream states
    (dedup/ANN/postings) cascade retirements from exactly this feed. The
    oracle replays all five transition classes closed-form from the raw
    customer table."""
    from .sinks.changes import table_changes

    path = _merge_delete_versions(spark, sf_dir)
    feed = table_changes(
        spark, path, ["k"], 0, per_version=True, delete_col="_deleted"
    )
    return feed.select(
        "k",
        "cents",
        "rev",
        F.col("_change_type").alias("change_type"),
        F.col("_commit_version").alias("commit_version"),
    )


from .operators.images import dhash_neardup_oracle_sql  # noqa: E402


@register(
    "image_dhash_neardup",
    oracle=dhash_neardup_oracle_sql(),
    tags=("multimodal", "dedup", "image", "real-decode"),
)
def q_image_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup (r15, VERDICT r14 item 1) — the
    image-level dedup family: every document becomes a REAL grayscale PNG
    (9×8 md5 grid in constant 2×2 blocks), every fifth doc ALSO a
    re-encoded variant of the same content at 3× scale; the stdlib
    decoder + exact box resize reduce both to the identical 9×8
    luminance grid, dHash packs the 64 horizontal gradient signs, and
    Hamming-banded LSH (4 × 16-bit bands, the simhash64 discipline)
    surfaces candidate pairs verified by exact ``bit_count(xor)``. The
    output is every pair within Hamming 6 — exactly the 20% re-encoded
    variants at distance 0; byte-hash ``dedup_exact`` sees nothing here
    (different files), which is the family's point. The oracle replays
    grid → bits → pack → band join → Hamming closed-form from the raw
    text, so the real encode → decode → resize → hash pipeline is
    value-pinned end to end. At 100 TB: one Arrow decode+hash pass, a
    banded self-equi-join — never all-pairs, no corpus-sized exchange
    beyond the band explode."""
    from .operators.images import (
        encode_grid_png,
        image_dhash,
        image_neardup_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    base = encode_grid_png(docs, scale=2).select(
        (F.col("doc_id") * 2).alias("img_id"), "payload"
    )
    variants = encode_grid_png(
        docs.filter(F.col("doc_id") % 5 == 0), scale=3
    ).select((F.col("doc_id") * 2 + 1).alias("img_id"), "payload")
    hashes = image_dhash(base.unionByName(variants), id_col="img_id")
    return image_neardup_pairs(hashes, id_col="img_id", max_hamming=6)


from .operators.images import incremental_image_neardup_oracle_sql  # noqa: E402


@register(
    "image_neardup_incremental_state",
    oracle=incremental_image_neardup_oracle_sql(),
    tags=("multimodal", "dedup", "image", "incremental", "sink"),
)
def q_image_neardup_incremental_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental image near-dup against PERSISTED band state (r16,
    VERDICT r15 item 5 — images were batch-only: a re-crawled corpus
    re-hashed and re-paired everything). Two crawl batches run through
    ``incremental_image_neardup`` with the dHash band index persisted
    through the real pointer-committed merge sink between them: batch 1 =
    even doc_ids' base images; batch 2 = odd doc_ids' base images PLUS
    3×-scale re-encodes of every ``doc_id % 10 = 0`` doc — the re-crawled
    variants hash identically to their batch-1 bases, so the
    ``(band, bkey)`` state probe drops them whole while the genuinely
    novel odd images survive into the index. Returns the COMMITTED state
    read back via the manifest; the oracle replays both increments
    closed-form from the raw text (hashing, banding, exact-Hamming
    verify, recursive-CTE clustering, state-hit drop), so the hash pins
    the operator AND the sink's on-disk truth together. At 100 TB: per
    batch one Arrow decode+hash pass and two (band, bkey) equi-joins —
    probe cost tracks the BATCH, never the corpus; state rewrites touch
    only the key-hash buckets the delta lands in."""
    from .operators.images import encode_grid_png, image_dhash, incremental_image_neardup
    from .sinks.writer import read_merge_state, write_sink
    from .spec import SinkSpec

    docs = load(spark, sf_dir, "documents")
    path = scratch_dir("q_img_incr_") + "/band_index"
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("img_id", "band"),
        merge_order=("bkey",),
    )
    batch1 = image_dhash(
        encode_grid_png(docs.filter(F.col("doc_id") % 2 == 0), scale=2).select(
            (F.col("doc_id") * 2).alias("img_id"), "payload"
        ),
        id_col="img_id",
    ).select("img_id", "dhash")
    _, d1 = incremental_image_neardup(batch1, None, id_col="img_id")
    batch2 = (
        image_dhash(
            encode_grid_png(docs.filter(F.col("doc_id") % 2 == 1), scale=2)
            .select((F.col("doc_id") * 2).alias("img_id"), "payload")
            .unionByName(
                encode_grid_png(
                    docs.filter(F.col("doc_id") % 10 == 0), scale=3
                ).select((F.col("doc_id") * 2 + 1).alias("img_id"), "payload")
            ),
            id_col="img_id",
        )
        .select("img_id", "dhash")
        .localCheckpoint(eager=False)
    )
    from .session import run_independent_actions

    # hash the NEXT crawl batch while the current batch's state commits
    # (r17, guide §2.6 — the two actions are independent: the hash pass
    # reads only raw docs; only batch 2's state PROBE needs commit 1).
    # The checkpoint holds (id, hash) rows, never payload bytes.
    run_independent_actions(
        lambda: write_sink(d1, sink),
        lambda: batch2.count(),
    )
    _, d2 = incremental_image_neardup(
        batch2, read_merge_state(spark, path), id_col="img_id"
    )
    write_sink(d2, sink)
    return read_merge_state(spark, path).select("band", "bkey", "img_id", "dhash")


from .operators.images import dhash_survivors_oracle_sql  # noqa: E402


@register(
    "image_dedup_survivors",
    oracle=dhash_survivors_oracle_sql(),
    tags=("multimodal", "dedup", "image"),
)
def q_image_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IMAGE dedup survivor selection (r16) — the image-level
    parity of the text family's candidates → clusters → survivors chain
    (`dedup_clusters` / `dedup_survivors`): perceptual pairs from the
    banded dHash join, transitive closure via the same bounded
    min-label-propagation `connected_components`, and one representative
    (the min-id member) kept per duplicate cluster — singletons are their
    own cluster. On the standard fixture every 3×-rescaled variant
    clusters with its base at Hamming 0 and the base survives, so the
    output is exactly the base image set; the oracle replays hashing,
    banding, exact-Hamming verify and the recursive-CTE closure
    closed-form from the raw text. Same scale shape as the pairs row plus
    the iterative closure (per iteration one join + min-agg, lineage
    truncated — bounded by the duplicate-graph diameter, never the
    corpus)."""
    from .operators.dedup import connected_components
    from .operators.images import (
        encode_grid_png,
        image_dhash,
        image_neardup_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    base = encode_grid_png(docs, scale=2).select(
        (F.col("doc_id") * 2).alias("img_id"), "payload"
    )
    variants = encode_grid_png(
        docs.filter(F.col("doc_id") % 5 == 0), scale=3
    ).select((F.col("doc_id") * 2 + 1).alias("img_id"), "payload")
    # one decode+hash evaluation for the whole chain (r16 optimization,
    # guide §1.2): pairs, clustering, AND the membership join below all
    # re-reference this frame — the lazy localCheckpoint materializes the
    # Arrow decode pass once at the first action (the id+hash rows, never
    # payload bytes). This outer checkpoint is NOT redundant with the one
    # inside image_neardup_pairs: the membership join must see NULL-hash
    # (undecodable) images as their own singletons, which pairs' live
    # frame deliberately drops.
    hashes = image_dhash(
        base.unionByName(variants), id_col="img_id"
    ).localCheckpoint(eager=False)
    pairs = image_neardup_pairs(hashes, id_col="img_id", max_hamming=6)
    clusters = connected_components(pairs, "id_a", "id_b").select(
        F.col("doc_id").alias("img_id"), "cluster_id"
    )
    membership = (
        hashes.select("img_id")
        .join(clusters, on="img_id", how="left")
        .select(
            "img_id",
            F.coalesce("cluster_id", F.col("img_id")).alias("cluster_id"),
        )
    )
    return membership.where(F.col("img_id") == F.col("cluster_id")).select(
        "img_id"
    )


@register(
    "stream_cdc_image_ingest",
    oracle=incremental_image_neardup_oracle_sql(),
    tags=("streaming", "cdc", "multimodal", "dedup", "image", "incremental", "sink"),
)
def q_stream_cdc_image_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC tail × incremental image near-dup COMPOSITION driver-verified
    end to end (r16) — the fourth CDC-fed composition beside the
    semantic / ANN-index / postings siblings: an upstream image merge
    table (real PNG payloads keyed by img_id) commits three versions
    (v0 empty bootstrap, v1 = even docs' base images, v2 = odd bases +
    3×-rescaled re-crawls of every ``doc_id % 10 = 0`` doc), and
    ``run_cdc_image_ingest`` tails its change feed — per-version
    ``table_changes`` increments, insert/update_postimage rows only,
    commit version as the exactly-once claim — through the dHash band
    index sink. The oracle is the SAME two-increment replay that pins
    ``image_neardup_incremental_state``: the composition must be
    value-invisible — routing the batches through the real change feed +
    version-tail + claim machinery changes NOTHING about the index the
    pipeline keeps. The re-crawled variants drop against the committed
    state; the novel odd images survive into it."""
    from .operators.images import encode_grid_png
    from .sinks.writer import read_merge_state, write_sink
    from .spec import SinkSpec

    docs = load(spark, sf_dir, "documents")
    root = scratch_dir("q_cdc_img_")
    up = f"{root}/upstream"
    sink = SinkSpec(
        type="parquet",
        path=up,
        mode="merge",
        merge_key=("img_id",),
        merge_order=("rev",),
        merge_keep_versions=4,
    )
    b1 = encode_grid_png(docs.filter(F.col("doc_id") % 2 == 0), scale=2).select(
        (F.col("doc_id") * 2).alias("img_id"), "payload"
    )
    b2 = (
        encode_grid_png(docs.filter(F.col("doc_id") % 2 == 1), scale=2)
        .select((F.col("doc_id") * 2).alias("img_id"), "payload")
        .unionByName(
            encode_grid_png(docs.filter(F.col("doc_id") % 10 == 0), scale=3).select(
                (F.col("doc_id") * 2 + 1).alias("img_id"), "payload"
            )
        )
    )
    write_sink(b1.limit(0).withColumn("rev", F.lit(0)), sink)
    write_sink(b1.withColumn("rev", F.lit(1)), sink)
    write_sink(b2.withColumn("rev", F.lit(2)), sink)
    from .streaming.ingest import run_cdc_image_ingest

    run_cdc_image_ingest(
        spark,
        up,
        ["img_id"],
        f"{root}/state",
        f"{root}/corpus",
        checkpoint=f"{root}/ckpt",
    )
    return read_merge_state(spark, f"{root}/state").select(
        "band", "bkey", "img_id", "dhash"
    )


@register(
    "image_phash_neardup",
    oracle="""
    SELECT doc_id * 2 AS id_a, doc_id * 2 + 1 AS id_b, 0 AS hamming
    FROM documents WHERE doc_id % 5 = 0
    """,
    tags=("multimodal", "dedup", "image", "real-decode"),
)
def q_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pHash-banded image near-dup (r16, VERDICT r15 item 3) — the
    noise-robust DCT hash through the SAME banding + exact-Hamming
    discipline as the dHash row. The float DCT is not replayable in SQL,
    so the oracle is GROUND TRUTH BY CONSTRUCTION: every fifth doc's
    image is re-encoded at 3× scale, and because the exact box resize
    reproduces the same 32×32 luminance surface at any block scale
    (pytest-pinned at 2×/3×/5×), each variant pHashes IDENTICALLY to its
    base — the expected output is exactly the ``(base, variant, 0)``
    pairs, nothing else (a spurious cross-doc pair, a missed variant, or
    a nonzero distance all flip the hash). Recall and precision are both
    pinned: banding must surface every variant pair, and two distinct
    md5-grid images must never land within Hamming 6 of each other's
    63-bit DCT signs. Same 100 TB shape as dHash: one Arrow pass, banded
    self-equi-join, never all-pairs."""
    from .operators.images import (
        encode_grid_png,
        image_neardup_pairs,
        image_phash,
    )

    docs = load(spark, sf_dir, "documents")
    base = encode_grid_png(docs, scale=2).select(
        (F.col("doc_id") * 2).alias("img_id"), "payload"
    )
    variants = encode_grid_png(
        docs.filter(F.col("doc_id") % 5 == 0), scale=3
    ).select((F.col("doc_id") * 2 + 1).alias("img_id"), "payload")
    hashes = image_phash(base.unionByName(variants), id_col="img_id")
    return image_neardup_pairs(
        hashes, id_col="img_id", hash_col="phash", max_hamming=6
    ).select("id_a", "id_b", "hamming")


#: the compact row's ONE deletion-predicate definition — embedded in the
#: oracle SQL and applied Spark-side via F.expr; training-prefix ids and
#: query ids stay live so the frozen artifacts and probe vectors remain
#: derivable from the table
_ANN_DELETED_PRED = "vec_id % 10 = 7 AND vec_id >= 16"

#: memoized per sf_dir: build → delete upstream → compact once; the row
#: prices the probe-only serve over the compacted state
_ANN_COMPACT_CACHE: dict[str, str] = {}


def _ann_compacted_index(spark: SparkSession, sf_dir: str) -> str:
    cached = _ANN_COMPACT_CACHE.get(sf_dir)
    if cached:
        return cached
    from .operators.similarity import (
        ann_index_compact,
        ivf_pq_index_assign,
        ivf_pq_index_train,
    )
    from .sinks.writer import write_sink
    from .spec import SinkSpec

    emb = load(spark, sf_dir, "embeddings")
    root = scratch_dir("q_ann_compact_")
    cents, cb = ivf_pq_index_train(emb)
    cents.write.parquet(f"{root}/centroids")
    cb.write.parquet(f"{root}/codebook")
    write_sink(
        ivf_pq_index_assign(
            emb,
            spark.read.parquet(f"{root}/centroids"),
            spark.read.parquet(f"{root}/codebook"),
        ).withColumn("_ingest_version", F.lit(1)),
        SinkSpec(
            type="parquet",
            path=f"{root}/index",
            mode="merge",
            merge_key=("cand_id", "s"),
            merge_order=("_ingest_version",),
            sort_by=("cid",),
        ),
    )
    # ONE definition of the deletion predicate — F.expr over the same
    # SQL string the oracle embeds (r15 review finding: hand-synchronized
    # Spark copies are the drifted-copy hazard _bm25_contrib documents)
    live = emb.filter(~F.expr(_ANN_DELETED_PRED))
    removed = ann_index_compact(spark, root, live)
    assert removed > 0, "compact fixture expected stale index rows"
    _ANN_COMPACT_CACHE[sf_dir] = root
    return root


@register(
    "ann_index_compact_serve",
    oracle=ivf_pq_oracle_sql(corpus_pred=f"NOT ({_ANN_DELETED_PRED})"),
    tags=("similarity", "ivf", "pq", "serving", "maintenance"),
)
def q_ann_index_compact_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN maintenance loop driver-verified end to end (r15, VERDICT
    r14 item 2 — ``ann_index_compact`` was pytest-only): build the
    persisted IVF-PQ index over the full corpus, retire every
    ``vec_id % 10 == 7`` vector upstream, reconcile with
    ``ann_index_compact`` (anti-join victim discovery, only stale
    buckets rewritten under the staged-tree CAS), then serve PROBE-ONLY
    from the compacted state. The oracle is the standard IVF-PQ replay
    with the searchable corpus restricted to the live predicate while
    artifacts / queries / distance tables derive from the full table —
    exactly the pinned 'compacted ≡ fresh-assign against frozen
    artifacts' contract, now value-hashed by the driver. A deleted
    vector appearing in any shortlist, or a live bucket lost by the
    rewrite, flips the hash."""
    from .operators.similarity import ivf_pq_topk_indexed
    from .sinks.writer import read_merge_state

    root = _ann_compacted_index(spark, sf_dir)
    live = load(spark, sf_dir, "embeddings").filter(
        ~F.expr(_ANN_DELETED_PRED)
    )
    return ivf_pq_topk_indexed(
        read_merge_state(spark, f"{root}/index").select(
            "cand_id", "cid", "s", "code"
        ),
        spark.read.parquet(f"{root}/centroids"),
        spark.read.parquet(f"{root}/codebook"),
        live,
    )


#: memoized per sf_dir: seed → tombstone → PURGE once; the row reads the
#: RAW post-purge state (no delete_col), so a tombstone that survived the
#: physical rewrite — or a live row it wrongly swept — flips the hash
_PURGE_STATE_CACHE: dict[str, str] = {}


def _purged_tombstone_state(spark: SparkSession, sf_dir: str) -> str:
    cached = _PURGE_STATE_CACHE.get(sf_dir)
    if cached:
        return cached
    from .sinks.writer import purge_tombstones, write_sink
    from .spec import SinkSpec

    c = load(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    k = F.col("c_custkey")

    def batch(pred, rev, dead):
        return c.filter(pred).select(
            k.alias("k"),
            cents.alias("cents"),
            F.lit(rev).cast("long").alias("rev"),
            F.lit(dead).alias("_deleted"),
        )

    path = scratch_dir("q_purge_state_") + "/state"
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("rev",),
        delete_column="_deleted",
    )
    write_sink(batch(k % 3 == 0, 0, False), sink)
    write_sink(
        batch(k % 6 == 0, 1, True).unionByName(batch(k % 3 == 1, 1, False)),
        sink,
    )
    removed = purge_tombstones(spark, sink)
    assert removed > 0, "purge fixture expected tombstones to reclaim"
    _PURGE_STATE_CACHE[sf_dir] = path
    return path


@register(
    "merge_purge_tombstones",
    oracle="""
    WITH cents AS (
      SELECT c_custkey AS k,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS c
      FROM customer
    )
    SELECT k, c AS cents, CAST(0 AS BIGINT) AS rev
    FROM cents WHERE k % 3 = 0 AND k % 6 <> 0
    UNION ALL
    SELECT k, c AS cents, CAST(1 AS BIGINT) AS rev
    FROM cents WHERE k % 3 = 1
    """,
    tags=("etl", "sink", "merge", "delete", "maintenance"),
)
def q_merge_purge_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone GC driver-verified end to end (r15, VERDICT r14 item 2 —
    ``purge_tombstones`` was pytest-only): v0 seeds ``k % 3 == 0``, v1
    tombstones ``k % 6 == 0`` and inserts ``k % 3 == 1``, then
    ``purge_tombstones`` physically reclaims the retired keys (only
    tombstone-bearing buckets rewritten, staged-tree CAS commit, the
    Cassandra gc-grace discipline). The row reads the state RAW — no
    ``delete_col`` filter — so the oracle's closed-form live set matches
    ONLY if every winning tombstone is physically gone AND every
    survivor kept its payload/version through the rewrite. (The logical
    live view is value-identical before and after a purge, and a purge
    commit's CDC diff is empty — both pinned in tests/test_merge_delete;
    this row pins the PHYSICAL half the driver could not see.)"""
    from .sinks.writer import read_merge_state

    path = _purged_tombstone_state(spark, sf_dir)
    return read_merge_state(spark, path).select("k", "cents", "rev")


@register(
    "hybrid_rrf_search_indexed",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id
    ), stats AS (
      SELECT count(*) AS n, sum(dl) AS sumdl FROM dl
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN ('window', 'merge', 'scan') GROUP BY doc_id, term
    ), dfq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), contrib AS (
      SELECT t.doc_id,
             CAST(floor(
               ((s.n - d.df + 0.5) / (d.df + 0.5))
               * ((t.tf * 2.2)
                  / (t.tf + 1.2 * (0.25 + 0.75 * (l.dl * s.n) / s.sumdl)))
               * 1000000.0 + 0.5
             ) AS BIGINT) AS c
      FROM tf t JOIN dfq d USING (term) JOIN dl l USING (doc_id), stats s
    ), lex AS (
      SELECT doc_id, row_number() OVER (ORDER BY smicro DESC, doc_id) AS rank
      FROM (SELECT doc_id, sum(c) AS smicro FROM contrib GROUP BY doc_id)
      ORDER BY rank LIMIT 20
    ), sem AS (
      SELECT cand_id AS doc_id,
             row_number() OVER (ORDER BY cos_sim DESC, cand_id) AS rank
      FROM ( {ivf_pq_oracle_sql(query_ids="0", k=20, rerank=32)} )
    ), fused AS (
      SELECT doc_id, sum(CAST(floor(1000000.0 / (60 + rank)) AS BIGINT)) AS rrf_micro
      FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)
      GROUP BY doc_id
    )
    SELECT doc_id, CAST(rrf_micro AS BIGINT) / 1000000.0 AS rrf FROM (
      SELECT *, row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS rn
      FROM fused
    ) WHERE rn <= 10
    """,
    tags=("text", "search", "similarity", "hybrid", "ranking", "serving"),
)
def q_hybrid_rrf_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval over the PERSISTED indexes (r15, VERDICT r14
    item 3 — the production serving shape): RRF-fuse the probe-only BM25
    top-20 (``bm25_topk_indexed`` — |terms| inverted-list bucket reads,
    ``term IN`` pushed) with the probe-only IVF-PQ top-20 for query
    vector 0 (``ivf_pq_topk_indexed`` — literal ``cid IN`` pushdown, ADC
    from codes, rerank=32 raw vectors). The r14 ``hybrid_rrf_search``
    row fuses the two INLINE scorers — a full tokenize pass and a full
    embedding scan per query, exactly the passes the r13/r14 index work
    eliminated; this row's plan touches NO documents scan at all
    (plan-guarded) and reads the embeddings table only for the query
    vector and the 32-candidate rerank. The lexical ranking is bit-equal
    to the inline hybrid's by the indexed ≡ inline pin; the semantic
    side is the IVF-PQ probe's own oracle chain (approximate vs brute
    force by design — the recall trade is priced by
    ``ann_recall_report``); the fusion is exact BIGINT micro-units over
    two top-k-bounded frames."""
    from pyspark.sql import Window

    from .operators.search import bm25_topk_indexed, rrf_fuse
    from .operators.similarity import ivf_pq_topk_indexed
    from .sinks.writer import read_merge_state

    lex = bm25_topk_indexed(
        spark, _bm25_persisted_index(spark, sf_dir), _BM25_TERMS, k=20
    )
    lex_rank = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id")))
        .alias("rank"),
    )
    root = _ivf_pq_persisted_index(spark, sf_dir)
    sem = ivf_pq_topk_indexed(
        read_merge_state(spark, f"{root}/index").select(
            "cand_id", "cid", "s", "code"
        ),
        spark.read.parquet(f"{root}/centroids"),
        spark.read.parquet(f"{root}/codebook"),
        load(spark, sf_dir, "embeddings"),
        query_ids=(0,),
        k=20,
        rerank=32,
    )
    sem_rank = sem.select(
        F.col("cand_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.col("cos_sim").desc(), F.col("cand_id")))
        .alias("rank"),
    )
    return rrf_fuse([lex_rank, sem_rank], k=10)


@register(
    "hybrid_rrf_batch_indexed",
    oracle=f"""
    WITH lex AS (
      SELECT query_id, doc_id,
             row_number() OVER (
               PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rank
      FROM ( {bm25_batch_oracle_sql(_BM25_BATCH_QUERIES, k=20)} )
    ), sem AS (
      SELECT query_id, cand_id AS doc_id,
             row_number() OVER (
               PARTITION BY query_id ORDER BY cos_sim DESC, cand_id) AS rank
      FROM ( {ivf_pq_oracle_sql(query_ids="0, 1, 2", k=20, rerank=32)} )
    ), fused AS (
      SELECT query_id, doc_id,
             sum(CAST(floor(1000000.0 / (60 + rank)) AS BIGINT)) AS rrf_micro
      FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)
      GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, CAST(rrf_micro AS BIGINT) / 1000000.0 AS rrf
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id) AS rn
      FROM fused
    ) WHERE rn <= 10
    """,
    tags=("text", "search", "similarity", "hybrid", "ranking", "serving", "batch"),
)
def q_hybrid_rrf_batch_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCHED hybrid retrieval over the persisted indexes (r15 — the
    decontamination-at-scale serving shape, composing this round's
    single-query `hybrid_rrf_search_indexed` with the r14 batch
    machinery): THREE queries, each pairing a term set with its query
    vector (ids 0/1/2 — the fixture's vec_id ≡ query_id convention),
    fused per query in ONE pass. The lexical side is
    `bm25_batch_topk_indexed` — the union of all queries' terms read
    ONCE from the term-bucketed postings (one pruned probe, `term IN`
    pushed, per-query top-20 via a query-partitioned window); the
    semantic side is ONE `ivf_pq_topk_indexed` call over all three
    query vectors (one `cid IN` probe covering the union of their
    lists); the fusion is `rrf_fuse_batch` — exact BIGINT micro-units
    keyed (query, doc), final top-10 per query through a
    query-PARTITIONED window, never a global sort. At 100 TB with 10k
    benchmark questions: |union terms| inverted-list reads + one
    nprobe-bounded index probe TOTAL, versus 10k corpus tokenizes plus
    10k full embedding scans for the inline shape. Query 0's fused
    ranking is bit-equal to the single-query hybrid row's (pinned in
    pytest); the oracle replays both batch rankings and the per-query
    fusion end to end."""
    from .operators.search import bm25_batch_topk_indexed, rrf_fuse_batch
    from .operators.similarity import ivf_pq_topk_indexed
    from .sinks.writer import read_merge_state
    from pyspark.sql import Window

    lex = bm25_batch_topk_indexed(
        spark, _bm25_persisted_index(spark, sf_dir), _BM25_BATCH_QUERIES, k=20
    )
    w_lex = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    lex_rank = lex.select(
        "query_id", "doc_id", F.row_number().over(w_lex).alias("rank")
    )
    root = _ivf_pq_persisted_index(spark, sf_dir)
    sem = ivf_pq_topk_indexed(
        read_merge_state(spark, f"{root}/index").select(
            "cand_id", "cid", "s", "code"
        ),
        spark.read.parquet(f"{root}/centroids"),
        spark.read.parquet(f"{root}/codebook"),
        load(spark, sf_dir, "embeddings"),
        query_ids=(0, 1, 2),
        k=20,
        rerank=32,
    )
    w_sem = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("cand_id")
    )
    sem_rank = sem.select(
        "query_id",
        F.col("cand_id").alias("doc_id"),
        F.row_number().over(w_sem).alias("rank"),
    )
    return rrf_fuse_batch([lex_rank, sem_rank], k=10)


# The round driver snapshots only the FIRST 50 entries() queries per round.
# Through r11 the window was a hand-curated tuple re-derived from
# blast-radius arithmetic every round; r12 encodes the rotation policy
# itself (VERDICT r11 item 8): entries() orders queries by VERIFICATION
# NEED — (0) never driver-verified, then (1) body hash changed since the
# last green driver row (oldest evidence first), then (2) green at current
# hash, oldest evidence first — so new rows and flagged blast-radius rows
# claim window slots automatically and the spare slots always drain the
# oldest evidence. The body hash replicates scripts/window_check.py
# exactly (fn source + oracle + one-level `from .X import` module
# sources); scripts/VERIFIED.json is the evidence record, maintained by
# scripts/record_verified.py at round start. _VERIFY_FIRST survives as a
# manual OVERRIDE for rows that must lead the window regardless of the
# policy (normally empty).
_VERIFY_FIRST: tuple = ()

_IMPORT_RE = None
_ORDER_CACHE: list | None = None


def _body_hash(entry, _file_cache: dict) -> str:
    """sha256(fn source + oracle + one-level imported module sources) —
    MUST stay bit-compatible with scripts/window_check.py:body_hash."""
    import hashlib
    import inspect
    import os
    import re

    global _IMPORT_RE
    if _IMPORT_RE is None:
        _IMPORT_RE = re.compile(r"from \.([\w.]+) import")
    src = inspect.getsource(entry.fn)
    parts = [src, entry.oracle or "<no-oracle>"]
    pkg = os.path.dirname(os.path.abspath(__file__))
    for dotted in sorted(set(_IMPORT_RE.findall(src))):
        p = os.path.join(pkg, dotted.replace(".", "/") + ".py")
        if p not in _file_cache:
            try:
                with open(p) as f:
                    _file_cache[p] = f.read()
            except OSError:
                _file_cache[p] = None
        if _file_cache[p] is not None:
            parts.append(_file_cache[p])
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()


def _round_key(tag) -> tuple:
    """Ordering key for round tags: the embedded integer first (so 'r9' ==
    round 9 sorts before 'r10' and 'r100' sorts after 'r11' — lexicographic
    comparison breaks on both, r12 review finding 7; record_verified takes
    the tag as a free-form CLI arg), then the raw string as a deterministic
    tie-break with NO freshness meaning — same-integer tags ('r9' vs
    'r09') are the same round and their relative order is arbitrary."""
    import re

    m = re.search(r"(\d+)", str(tag))
    return (int(m.group(1)) if m else -1, str(tag))


def _verification_order() -> list:
    """Names in driver-window priority order (computed once per process —
    code and VERIFIED.json are immutable within a run). Falls back to
    registration order when the evidence record is unavailable (installed
    as a bare package, no scripts/ checkout)."""
    global _ORDER_CACHE
    if _ORDER_CACHE is not None:
        return _ORDER_CACHE
    import json
    import os

    names = list(REGISTRY)
    try:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "scripts", "VERIFIED.json")) as f:
            verified = json.load(f)
        file_cache: dict = {}

        def key(n):
            rec = verified.get(n)
            if rec is None:
                return (0, (-1, ""), n)  # never driver-verified
            if rec["hash"] != _body_hash(REGISTRY[n], file_cache):
                return (1, _round_key(rec["round"]), n)  # changed since green
            return (2, _round_key(rec["round"]), n)  # green — oldest first

        _ORDER_CACHE = sorted(names, key=key)
    except Exception:  # noqa: BLE001 — ordering is best-effort, never fatal
        _ORDER_CACHE = names
    return _ORDER_CACHE


def entries() -> dict[str, CatalogEntry]:
    ordered = {n: REGISTRY[n] for n in _VERIFY_FIRST if n in REGISTRY}
    ordered.update(
        (n, REGISTRY[n]) for n in _verification_order() if n not in ordered
    )
    return ordered
