"""Physical-plan inspection helpers.

The 100 TB discipline (SURVEY.md §7.5 risk 6) made checkable: every operator
should (a) push filters/projections into the parquet scan, (b) broadcast
small dimensions, (c) introduce no more exchanges than its semantics require.
These helpers parse ``explain("formatted")`` output so tests can assert plan
shape, not just result values — a regression here is a silent 10× at scale.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the parquet scan (PushedFilters)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings — what each scan actually reads."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def num_exchanges(df: DataFrame) -> int:
    """Count shuffle exchanges (excludes broadcast exchanges).

    ``explain("formatted")`` lists operators as ``(N) Exchange`` with the
    partitioning in an Arguments line; broadcast exchanges print as
    ``(N) BroadcastExchange`` and don't count — they're the cheap kind.
    """
    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.MULTILINE))


def num_broadcasts(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastExchange|BroadcastHashJoin|BroadcastNestedLoopJoin", formatted_plan(df)))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", formatted_plan(df))))
