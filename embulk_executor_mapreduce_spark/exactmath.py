"""Deterministic cross-engine float math for oracle-checked aggregates.

round(sum(double), 2) is summation-order dependent at the last ulp: Spark's
partial (map-side) aggregation and a single-node engine's sequential sum can
differ by one ulp, which flips a .xx5 rounding boundary (q3_segment_revenue
failed the round-1 driver hash exactly this way). Worse, Spark's round()
evaluates on the shortest decimal repr of the double (BigDecimal.valueOf)
while DuckDB rounds the raw binary value, so even the SAME double can round
differently across engines.

The discipline used by every catalog query:

* per-row fixed-point: ``floor(x * scale + 0.5)`` — one IEEE multiply + floor,
  bit-identical in both engines for the same stored double;
* exact BIGINT sum — order-independent, so partial aggregation at any
  parallelism (32 local threads or 1000 executors) gives the same integer;
* trailing double divisions — identical IEEE ops on both sides;
* final rounding via ``floor(x * 10^d + 0.5) / 10^d`` instead of ``round()``
  — a pure-IEEE deterministic function of the double.

Test data stores money as exact 2-decimal doubles, so scale=100 is lossless
cents; products of two/three 2-decimal values use scale=10^4/10^6.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def d_round(col: Column, digits: int = 2) -> Column:
    """Deterministic rounding of a double: floor(x * 10^d + 0.5) / 10^d."""
    p = 10 ** digits
    return F.floor(col * p + F.lit(0.5)) / F.lit(float(p))


def sql_d_round(expr: str, digits: int = 2) -> str:
    """DuckDB-side mirror of :func:`d_round` (same IEEE ops, same result)."""
    p = 10 ** digits
    return f"floor(({expr}) * {p} + 0.5) / {p}.0"


def exact_sum(col: Column, scale: int = 100, digits: int = 2) -> Column:
    """Order-independent sum of a double column via scaled-integer partials."""
    s = F.sum(F.floor(col * scale + F.lit(0.5))) / F.lit(float(scale))
    return d_round(s, digits) if scale > 10 ** digits else s


def sql_exact_sum(expr: str, scale: int = 100, digits: int = 2) -> str:
    s = f"sum(CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)) / {scale}.0"
    return sql_d_round(s, digits) if scale > 10 ** digits else s


def exact_avg(col: Column, scale: int = 100, digits: int = 2) -> Column:
    """Order-independent mean (sum of scaled ints / row count); assumes the
    measure column is non-null (count(*) semantics, matching the SQL mirror)."""
    a = (F.sum(F.floor(col * scale + F.lit(0.5))) / F.lit(float(scale))) / F.count(
        F.lit(1)
    )
    return d_round(a, digits)


def sql_exact_avg(expr: str, scale: int = 100, digits: int = 2) -> str:
    a = f"(sum(CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)) / {scale}.0) / count(*)"
    return sql_d_round(a, digits)
