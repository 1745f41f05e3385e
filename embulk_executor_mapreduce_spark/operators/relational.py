"""Relational operators Spark lacks as built-ins, composed from DataFrame ops.

- as-of join: union-tag + window last(ignoreNulls) — a single sort-within-
  partition per key instead of a per-key merge loop; scales as one exchange
  on the join key (the classic large-scale as-of shape; ``pd.merge_asof``
  inside applyInPandas would shuffle the same but lose codegen).
- sessionization: lag + cumulative-sum-of-gap-breaks window composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` key (ties: right row wins,
    i.e. a right row at exactly left_ts matches).

    Implementation: tag and union both sides, sort by (ts, side) within the
    key, carry right values forward with last(ignoreNulls), keep left rows.
    One shuffle on ``on``; no per-key iteration.
    """
    l = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    r = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("__ts"),
            *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        )
        .withColumn("__side", F.lit(0))
    )
    lcols = [c for c in l.columns if not c.startswith("__")]
    unioned = l.select(
        *lcols,
        "__side",
        "__ts",
        *[F.lit(None).cast(dict(r.dtypes)[f"__r_{c}"]).alias(f"__r_{c}") for c in right_cols],
    ).unionByName(
        r.select(
            *[
                F.lit(None).cast(dict(l.dtypes)[c]).alias(c) if c != on else F.col(on)
                for c in lcols
            ],
            "__side",
            "__ts",
            *[F.col(f"__r_{c}") for c in right_cols],
        )
    )
    w = (
        W.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True)
            .over(w)
            .alias(f"{c}_asof" if c in lcols else c)
            for c in right_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the previous
    event of the same key exceeds ``gap_seconds``. Output adds
    ``session_seq`` (1-based per key). One exchange on the key."""
    order = W.partitionBy(key).orderBy(ts, "event_id")
    # exact integer microseconds — no float seconds near the gap threshold
    gap_us = F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(ts).over(order))
    is_new = F.when(gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1).otherwise(0)
    running = W.partitionBy(key).orderBy(ts, "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return df.withColumn("session_seq", F.sum(is_new).over(running))
