"""Timestamp bucketing + skew salting — the reference's one partitioning strategy.

Semantics being matched (SURVEY.md §2.2 O5–O7; reference
``TimestampPartitioning.java``):

- ``unit: hour`` → bucket = ``floor(epoch_seconds / 3600)``; ``unit: day`` →
  ``floor(epoch_seconds / 86400)``. UTC only (the reference raises a
  ConfigException for any other timezone, ``TimestampPartitioning.java:128-136``).
- The partition column may be a ``timestamp`` (epoch seconds taken directly,
  ``TimestampPartitioning.java:293-307``) or a ``long`` carrying a unix time in
  ``sec | milli | micro | nano`` (divided down to seconds first,
  ``TimestampPartitioning.java:88-120,309-329``). The division is EXACT
  integer arithmetic (pmod-subtract, no double round-trip) — a nano-unit long
  exceeds 2^53, where ``floor(col / lit)``'s double division can misplace rows
  within a few hundred ns of a bucket boundary.
  DELIBERATE DIVERGENCE from the reference: Java's plain ``/`` truncates
  toward zero, so the reference buckets pre-1970 timestamps upward; we floor
  toward -inf so a pre-epoch timestamp still lands in its own wall-clock
  hour/day. Post-1970 the two are identical.
- ``map_side_partition_split: N`` (1..65535) appends a salt so one hot bucket
  spreads over up to N reduce tasks
  (``TimestampPartitioning.java:42-46,273-289``). Spark-first: the salt is a
  uniform hash of ROW CONTENT — deterministic under task re-execution. A
  nondeterministic source (partition-position counters,
  monotonically_increasing_id) can assign different salts on a retried map
  task, and reducers fetching from mixed attempts would silently drop or
  duplicate rows (the SPARK-23207 class of bug Spark only guards for
  round-robin repartition).

Everything here returns Catalyst ``Column`` expressions — no UDFs — so bucket
computation stays JVM-side and whole-stage-codegen'd, and repartitioning on the
bucket column is a plain hash exchange Catalyst can reason about.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import PartitionError

UNIT_SECONDS = {"hour": 3600, "day": 86400}

# unix_timestamp_unit → divisor to get seconds (TimestampPartitioning.java:88-120)
UNIX_UNIT_DIVISOR = {
    "sec": 1,
    "second": 1,
    "seconds": 1,
    "milli": 1_000,
    "millisecond": 1_000,
    "milliseconds": 1_000,
    "micro": 1_000_000,
    "microsecond": 1_000_000,
    "microseconds": 1_000_000,
    "nano": 1_000_000_000,
    "nanosecond": 1_000_000_000,
    "nanoseconds": 1_000_000_000,
}

MAX_SPLIT = 65535  # TimestampPartitioning.java:42-46 caps map_side_partition_split


def _floor_div(col: Column, divisor: int) -> Column:
    """Exact floor division on longs (negative-safe, toward -inf).

    ``col - pmod(col, d)`` is an exact multiple of ``d`` in long arithmetic;
    the decimal(38,0) division of an exact multiple has no fractional part, so
    no rounding occurs anywhere — exact for the full long range (a plain
    ``floor(col / lit)`` routes through double division, inexact above 2^53,
    which nano-unit timestamps exceed)."""
    if divisor == 1:
        return col
    exact_multiple = (col - F.pmod(col, F.lit(divisor))).cast("decimal(38,0)")
    return (exact_multiple / F.lit(divisor)).cast(T.LongType())


def bucket_expr(
    df: DataFrame,
    column: str,
    unit: str = "hour",
    unix_timestamp_unit: str = "sec",
) -> Column:
    """Bucket expression: time bucket index (hours- or days-since-epoch) as LONG.

    Validates like the reference's config-time checks
    (``TimestampPartitioning.java:122-150``): unknown column, bad unit, bad
    unix unit, and unsupported column type all raise :class:`PartitionError`
    at plan time.
    """
    if unit not in UNIT_SECONDS:
        raise PartitionError(
            f"unknown partitioning unit {unit!r}: expected one of {sorted(UNIT_SECONDS)}"
        )
    fields = {f.name: f.dataType for f in df.schema.fields}
    if column not in fields:
        raise PartitionError(f"partitioning column {column!r} not found in schema")
    dtype = fields[column]

    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # epoch seconds of a timestamp; unix_timestamp() floors to seconds.
        # TIMESTAMP_NTZ (what plain parquet `timestamp[ms]` loads as under
        # inferTimestampNTZ / pandas-written files) is interpreted in the
        # session timezone — pinned to UTC by session.get_spark, so the
        # bucket index is reproducible across runs.
        seconds = F.unix_timestamp(F.col(column).cast(T.TimestampType()))
    elif isinstance(dtype, (T.LongType, T.IntegerType)):
        if unix_timestamp_unit not in UNIX_UNIT_DIVISOR:
            raise PartitionError(
                f"unknown unix_timestamp_unit {unix_timestamp_unit!r}: "
                f"expected sec|milli|micro|nano"
            )
        seconds = _floor_div(
            F.col(column).cast(T.LongType()), UNIX_UNIT_DIVISOR[unix_timestamp_unit]
        )
    else:
        raise PartitionError(
            f"partitioning column {column!r} must be timestamp or long, got {dtype.simpleString()}"
        )
    return _floor_div(seconds, UNIT_SECONDS[unit]).alias(f"__bucket_{unit}")


#: Partitioning-strategy SPI (VERDICT r5 item 5): the reference exposes a
#: pluggable ``Partitioning`` interface resolved by name
#: (``Partitioning.java:1-12``, looked up at ``MapReduceExecutor.java:129-137``)
#: even though only ``"timestamp"`` ships. This registry is the same slot,
#: mirroring :func:`...sources.readers.register_task_source` for sources: a
#: strategy is ``fn(df, partitioning_spec) -> Column`` producing the LONG
#: bucket index the exchange keys on. ``"timestamp"`` stays the only
#: built-in.
_PARTITIONING_REGISTRY: dict = {}


def register_partitioning(name: str, fn, validate=None) -> None:
    """Register a named partitioning strategy.

    ``fn(df, spec) -> Column`` computes the bucket index (spec is the
    pipeline's ``PartitioningSpec`` — ``spec.column`` etc. are available).
    ``validate(spec) -> None`` (optional) runs at config time and should
    raise :class:`PartitionError` on a bad spec, mirroring the reference's
    config-time ConfigException checks."""
    _PARTITIONING_REGISTRY[name] = (fn, validate)


def resolve_partitioning(name: str):
    """Strategy lookup by name; unknown names raise at config time with the
    known-strategy list (the reference throws ConfigException when the
    ``Partitioning`` class for ``partitioning.type`` can't be loaded)."""
    if name not in _PARTITIONING_REGISTRY:
        known = sorted({"timestamp", *_PARTITIONING_REGISTRY})
        raise PartitionError(
            f"unknown partitioning type {name!r}: known strategies are "
            f"{known} (register custom ones via register_partitioning)"
        )
    return _PARTITIONING_REGISTRY[name]


def _timestamp_strategy(df: DataFrame, spec) -> Column:
    return bucket_expr(df, spec.column, spec.unit, spec.unix_timestamp_unit)


def _timestamp_validate(spec) -> None:
    if spec.unit not in UNIT_SECONDS:
        raise PartitionError(f"unknown partitioning unit {spec.unit!r}")
    if not spec.column:
        raise PartitionError("partitioning.column is required")
    if spec.unix_timestamp_unit not in UNIX_UNIT_DIVISOR:
        raise PartitionError(
            f"unknown unix_timestamp_unit {spec.unix_timestamp_unit!r}"
        )


register_partitioning("timestamp", _timestamp_strategy, _timestamp_validate)


def salt_expr(split: int, cols: list[str | Column] | None = None) -> Column:
    """Uniform salt in ``[0, split)`` for hot-bucket spreading, derived from
    ROW CONTENT (xxhash64 over ``cols``) so it is stable across task
    re-execution — a retried map task assigns every row the same salt as the
    first attempt, so no reducer can double-fetch or miss rows when attempts
    mix (monotonically_increasing_id/round-robin counters are NOT stable and
    reintroduce the SPARK-23207 correctness hole under retry).

    The reference uses a per-mapper round-robin counter mod ``split``
    (``TimestampPartitioning.java:273-289``); a content hash has the same
    load-balancing property for distinct rows, no cross-row state, and
    stays codegen'd. ``cols=None`` hashes all columns of the attached frame
    at resolution time via ``F.struct('*')``.

    Caveat: fully IDENTICAL rows all hash to the same salt, so a hot bucket
    dominated by exact duplicates will not spread (the reference's counter
    would). That trade is deliberate — retry determinism over spreading
    duplicate payloads; if a workload is duplicate-heavy, dedup upstream
    (operators/dedup.py) or pass ``cols`` including a source-position column
    when the source provides one.
    """
    if not (1 <= split <= MAX_SPLIT):
        raise PartitionError(
            f"map_side_partition_split must be in [1, {MAX_SPLIT}], got {split}"
        )
    if split == 1:
        return F.lit(0)
    hashed = F.xxhash64(*cols) if cols else F.xxhash64(F.struct("*"))
    return F.pmod(hashed, F.lit(split)).cast(T.IntegerType())


def spread_narrow(df: DataFrame, key_col: str) -> DataFrame:
    """Spread a narrower-than-cluster scan across all cores before CPU-heavy
    per-row work (hashing fan-outs, Arrow-batched Python decode).

    A single small parquet file (one row group) scans as ONE partition, so
    everything downstream runs on one core / one Python worker while the
    rest of the cluster idles. The spread key is ``xxhash64(key_col)`` —
    deterministic under task re-execution (content-derived, no round-robin),
    and a DIFFERENT expression from any downstream ``groupBy(key_col)``
    hash-partitioning, so aggregation exchanges above it survive and remain
    reusable across self-join sides (see ``dedup.minhash_candidates``: the
    id-keyed spread elided that exchange and measured 6× slower).

    No-op when the input already has at least cluster-parallelism partitions
    — the 100 TB case, where scans arrive thousands of splits wide and an
    extra full-payload shuffle would be pure cost.

    The width probe is ``df.inputFiles()`` — metadata-only, no RDD
    conversion (``df.rdd.getNumPartitions()`` forces a full plan-to-RDD
    translation on every compile; measured cost on the minhash/IVF/PQ hot
    paths). File count under-counts multi-split files, which only errs
    toward spreading an already-parallel scan — and at 100 TB the file
    count alone is thousands, making this a guaranteed no-op. Non-file
    frames (in-memory tests, post-shuffle inputs) fall back to the RDD
    probe.
    """
    n_par = df.sparkSession.sparkContext.defaultParallelism
    try:
        cur = len(df.inputFiles())
    except Exception:  # noqa: BLE001 — planning-time probe only
        cur = 0
    if cur == 0:
        try:
            cur = df.rdd.getNumPartitions()
        except Exception:  # noqa: BLE001
            cur = n_par
    if cur >= n_par:
        return df
    return df.repartition(n_par, F.xxhash64(F.col(key_col)))


def repartition_by_bucket(
    df: DataFrame,
    column: str,
    unit: str = "hour",
    unix_timestamp_unit: str = "sec",
    reducers: int | None = None,
    map_side_partition_split: int = 1,
    bucket_col: str = "__bucket",
    keep_bucket: bool = False,
) -> DataFrame:
    """The reference's shuffle shape: records sharing a time bucket are routed
    together (one output transaction per reduce task,
    ``EmbulkPartitioningMapReduce.java:156-183``), optionally salted.

    ``reducers`` defaults to the input parallelism like the reference
    (``MapReduceExecutor.java:98``). Returns the repartitioned frame; the
    bucket column is dropped unless ``keep_bucket``.
    """
    if reducers is not None and reducers <= 0:
        raise PartitionError(f"reducers must be > 0, got {reducers}")
    # defaultParallelism, not df.rdd.getNumPartitions(): the latter forces an
    # RDD conversion of the whole plan at compile time (same fix as the
    # pipeline compiler's reducer default)
    n = reducers or df.sparkSession.sparkContext.defaultParallelism or 1
    out = df.withColumn(bucket_col, bucket_expr(df, column, unit, unix_timestamp_unit))
    keys = [bucket_col]
    if map_side_partition_split > 1:
        out = out.withColumn("__salt", salt_expr(map_side_partition_split))
        keys.append("__salt")
    out = out.repartition(n, *[F.col(k) for k in keys])
    drop = [] if keep_bucket else [bucket_col]
    if map_side_partition_split > 1:
        drop.append("__salt")
    return out.drop(*drop) if drop else out


def z_interleave(a: Column, b: Column, bits: int = 10) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of two
    non-negative ints — rows close in BOTH dimensions get close z-values, so
    range-partitioning + within-partition sorting on the key clusters
    multi-column locality into the same files/row groups (the lakehouse
    Z-ORDER layout). Pure long bit arithmetic in codegen — portable to any
    engine with shifts (same formula is the DuckDB oracle).
    """
    terms = []
    one = F.lit(1).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(a.cast("long"), i).bitwiseAND(one)
        bit_b = F.shiftright(b.cast("long"), i).bitwiseAND(one)
        terms.append(F.shiftleft(bit_a, 2 * i))
        terms.append(F.shiftleft(bit_b, 2 * i + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def z_interleave_sql(a: str, b: str, bits: int = 10) -> str:
    """The identical Morton-key formula as ANSI SQL (the DuckDB oracle side)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)
