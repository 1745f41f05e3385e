"""Frequency-sketch operators: provably-exact heavy hitters at sketch cost.

The reference engine has no sketch surface (its aggregates are the
MapReduce combiner path, SURVEY.md §2.2 O9); this is extension surface for
the 100 TB token/URL/entity-frequency questions a training-data pipeline
asks, where a plain ``groupBy(key).count()`` must shuffle ONE ROW PER
DISTINCT KEY — at web scale (10^9..10^11 distinct tokens/URLs) that shuffle
IS the job. The classic answer (Metwally et al., "Efficient Computation of
Frequent and Top-k Elements in Data Streams", ICDT 2005 — the Space-Saving
summary) bounds per-partition state to a fixed capacity and shuffles only
the candidate set.

Two passes over the data, both map-only until a candidate-bounded exchange:

1. **Candidate generation** — per-partition Space-Saving (capacity ``m``)
   via Arrow-batched ``mapInPandas`` over JUST the key column. Each
   partition emits ≤ m candidate keys plus one error-bound row: the value
   of its smallest counter at the end (0 if the sketch never saturated).
   Space-Saving guarantees any key whose true count in partition p exceeds
   that partition's final min-counter is in p's candidate set, so a key
   absent from EVERY partition's candidates has true global count ≤
   Σ_p min_counter_p — the computable miss bound ``eps``.
2. **Exact recount** — one corpus scan, inner-joined to the BROADCAST
   candidate set (capacity × partitions rows, corpus-independent), then a
   map-side-combinable count and a TakeOrdered top-k. Counts of reported
   keys are EXACT (pass 2 recounts, never trusts sketch estimates).

The result is **provably exact or a loud error**: the k-th reported count
must exceed ``eps`` (no missed key can out-rank the reported top-k) —
checked eagerly against the tiny (k rows + 1 scalar) outputs. On a Zipfian
corpus the bound passes at modest capacity; a refusal names the fix (raise
``capacity``). This is the honest contract a silent approximate top-k
lacks: wrong answers are impossible, only louder capacity demands.

Scale shape: pass-1 state is O(m) per partition; the only exchange carries
≤ m × n_partitions candidate keys + the recount's partial aggregates;
nothing anywhere is proportional to the distinct-key count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import EngineError


class HeavyHitterBoundError(EngineError):
    """The sketch capacity cannot PROVE the top-k exact on this data: some
    unreported key's count upper-bound exceeds the k-th reported count.
    Raise ``capacity`` (or lower ``k``) and re-run — the operator never
    returns a possibly-wrong ranking."""


def _space_saving_partition(capacity: int):
    """Per-partition Space-Saving over Arrow batches of a single key column
    named ``k``. Batch-level exact counts (C-speed ``value_counts``) merge
    into the bounded summary as weighted arrivals — the guarantee holds for
    weighted updates (insert-at-min+weight on eviction).

    Eviction is O(log m) via a lazy-deletion min-heap (stale entries are
    skipped at pop time; the heap is rebuilt when it grows past 4×capacity)
    — a linear min-scan would cost O(m) per evicted key, exactly in the
    flat-distribution regime whose error message tells users to RAISE
    capacity (r12 review finding)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import heapq

        counters: dict[str, int] = {}
        heap: list[tuple[int, str]] = []  # (count, key), lazily stale
        evicted = False
        for b in batches:
            for key, cnt in b["k"].value_counts().items():
                if key in counters:
                    counters[key] += int(cnt)
                    heapq.heappush(heap, (counters[key], key))
                elif len(counters) < capacity:
                    counters[key] = int(cnt)
                    heapq.heappush(heap, (int(cnt), key))
                else:
                    while True:  # skip stale heap entries
                        c, victim = heap[0]
                        if counters.get(victim) == c:
                            break
                        heapq.heappop(heap)
                    heapq.heappop(heap)
                    del counters[victim]
                    counters[key] = c + int(cnt)
                    heapq.heappush(heap, (c + int(cnt), key))
                    evicted = True
                if len(heap) > 4 * capacity:
                    heap = [(v, k2) for k2, v in counters.items()]
                    heapq.heapify(heap)
        # miss bound: a key absent from the summary was EVICTED at some
        # point, and Space-Saving bounds its true count by the final min
        # counter. If no eviction ever happened (distinct keys <= capacity,
        # INCLUDING exactly == capacity), nothing was ever missed — the
        # bound is 0, not the min counter (r12 review finding: conflating
        # 'sketch full' with 'sketch lossy' refused provably-exact answers)
        eps = min(counters.values()) if evicted else 0
        yield pd.DataFrame(
            {
                "k": [*counters.keys(), None],
                "eps": [*([None] * len(counters)), eps],
            }
        )

    return run


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    capacity: int = 64,
) -> DataFrame:
    """Exact global top-``k`` keys by frequency at sketch shuffle cost.

    Returns ``(key, n)`` ordered by (n DESC, key) — counts exact, ranking
    proven complete (see module docstring), else
    :class:`HeavyHitterBoundError`. Eager: executes the two passes at call
    time (the proof needs the k counts and the eps scalar — both tiny).

    The key column keeps its INPUT dtype: the sketch works over a string
    cast internally (Arrow batch uniformity), but the result casts back, so
    a numeric/timestamp ``key_col`` does not silently change type relative
    to a plain ``groupBy(key_col).count()`` (r12 advisor finding). Note the
    tiebreak inside an equal-count group is the string collation of the
    key (the internal ordering), documented rather than hidden.
    """
    if k > capacity:
        raise EngineError(
            f"heavy_hitters_exact needs k <= capacity (a partition emits at "
            f"most capacity candidates), got k={k} capacity={capacity}"
        )
    # dot-free scratch alias before the Arrow stage (mapInPandas dotted-name
    # trap — see operators/audio.py _AID) + single-column pre-select pruning.
    # NULL keys are excluded (value_counts drops them in the sketch; the
    # recount must agree)
    keys = df.select(F.col(key_col).cast("string").alias("k")).filter(
        F.col("k").isNotNull()
    )
    sketch = keys.mapInPandas(
        _space_saving_partition(capacity), schema="k string, eps long"
    )
    # bounded: <= (capacity + 1) x n_partitions rows — cache so candidates
    # and the eps sum share one pass-1 execution
    sketch = sketch.cache()
    try:
        eps = sketch.agg(F.sum("eps").alias("e")).collect()[0]["e"] or 0
        candidates = sketch.filter(F.col("k").isNotNull()).select("k").distinct()
        top = (
            keys.join(F.broadcast(candidates), "k")
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("k"))
            .limit(k)
        )
        rows = top.collect()
        if len(rows) >= k and rows[-1]["n"] <= eps:
            raise HeavyHitterBoundError(
                f"cannot prove top-{k} exact: k-th count {rows[-1]['n']} <= "
                f"miss bound {eps}; raise capacity (currently {capacity})"
            )
        spark = df.sparkSession
        out = spark.createDataFrame(
            [(r["k"], r["n"]) for r in rows], schema="k string, n long"
        )
        return out.select(
            F.col("k").cast(df.schema[key_col].dataType).alias(key_col), "n"
        )
    finally:
        sketch.unpersist()
