"""Runtime key-set prefilters: bloom-style bitmap tables for exact anti-joins.

The incremental-ingestion hot path ("which of these delta rows are NOT
already in the landed corpus?") is an anti-join of a small delta against a
huge state. The bucket-pruned merge state (sinks/writer.py) already bounds
that join to the touched buckets; this module adds the complementary
runtime-filter layer for the case where the delta's keys mostly DON'T exist
in state: a compact bloom bitmap over the state's key set, probed map-side,
so rows that provably cannot match never enter the exchange at all. Spark's
own runtime row-level filtering (`spark.sql.optimizer.runtime.bloomFilter.*`)
applies the same idea inside one query; this is the cross-job/persistable
variant — the bitmap is itself a DataFrame, so it can be written next to the
state and reused by every later increment.

Exactness contract: a bloom filter has false POSITIVES only. Probe-positive
rows are re-verified with a real anti-join against state (so false positives
cost only wasted work, never a wrong row); probe-negative rows are provably
absent from state (no false negatives), so they skip the join entirely. The
composed result is bit-equal to a plain anti-join — which is exactly what
the DuckDB oracle checks (`catalog.py::q_bloom_prefilter_dedup`).

Spark-first representation — the bitmap is a TABLE, not a driver object:
``(w: long, bits: long)`` rows, one per 64-bit word that has at least one
bit set. Building it is one map-side-combinable ``groupBy(w).agg(bit_or)``;
probing is an equi-join on ``w``. Catalyst then picks the physical strategy
by size: a few MB of bitmap broadcasts (map-only probe — the default, and
the common case: ~2 bytes/key at 1% fpp means 10^9 state keys fit in ~2 GB,
10^8 in ~200 MB), while a bitmap too large to broadcast still works as a
shuffle join — unlike ``DataFrame.stat.bloomFilter``, which materializes the
whole filter on the driver and dies exactly when the state gets interesting.
No driver collect anywhere in this module.

100 TB shape: build cost is one linear pass over state keys (do it once,
persist the bitmap beside the state, rebuild per compaction); per-increment
cost is a narrow scan of the delta + ``num_hashes`` broadcast probes + one
anti-join whose left side is only the probe-positive sliver. At a 1% fpp
and a 99%-new delta, the exchange carries ~2% of the delta instead of 100%.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 16 bits/key with 2 hash functions ≈ 1.5% false-positive rate
#: (k=2, m=16n → (2n/m)^2 = (1/8)^2); fpp only affects wasted verify work,
#: never correctness.
DEFAULT_BITS_PER_KEY = 16
DEFAULT_NUM_HASHES = 2

_MAYBE = "__rf_maybe"


def suggest_m_bits(n_keys: int, bits_per_key: int = DEFAULT_BITS_PER_KEY) -> int:
    """Next power of two ≥ n_keys * bits_per_key (min 1024). At 100 TB take
    ``n_keys`` from table/manifest statistics, not a count job."""
    target = max(1024, int(n_keys) * bits_per_key)
    m = 1024
    while m < target:
        m *= 2
    return m


def _positions(df: DataFrame, key_cols: list[str], m_bits: int, j: int):
    """Bit position for hash function j: xxhash64 seeded by a trailing
    literal (independent 64-bit mixes per j), folded into [0, m_bits)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols], F.lit(j)), F.lit(m_bits))


def keyset_bitmap(
    state_keys: DataFrame,
    key_cols: list[str],
    m_bits: int,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Bloom bitmap over the state's key set as a ``(w, bits)`` table.

    One row per 64-bit word with ≥1 set bit, so an m-bit filter over n keys
    is at most ``min(m/64, n*num_hashes)`` rows. The aggregate is
    ``groupBy(w).agg(bit_or)`` — map-side combinable, one exchange over at
    most m/64 distinct words regardless of state size.
    """
    frames = [
        state_keys.select(_positions(state_keys, key_cols, m_bits, j).alias("pos"))
        for j in range(num_hashes)
    ]
    allpos = reduce(lambda a, b: a.unionAll(b), frames)
    return (
        allpos.select(
            F.expr("pos div 64").alias("w"),
            F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
    )


def probe_bitmap(
    incoming: DataFrame,
    bitmap: DataFrame,
    key_cols: list[str],
    m_bits: int,
    num_hashes: int = DEFAULT_NUM_HASHES,
    broadcast: bool = True,
) -> DataFrame:
    """Append a boolean ``__rf_maybe`` column: True iff EVERY hash position
    of the row's key is set in the bitmap (i.e. the key MIGHT be in state;
    False means provably absent). ``broadcast=True`` (default) hints the
    bitmap side; pass False to let Catalyst/AQE choose for a bitmap that
    outgrew the broadcast threshold — the probe stays correct either way."""
    out = incoming
    for j in range(num_hashes):
        bm = bitmap.withColumnRenamed("w", f"__rf_w{j}").withColumnRenamed(
            "bits", f"__rf_bits{j}"
        )
        if broadcast:
            bm = F.broadcast(bm)
        out = out.withColumn(
            f"__rf_pos{j}", _positions(incoming, key_cols, m_bits, j)
        ).withColumn(f"__rf_w{j}_probe", F.expr(f"__rf_pos{j} div 64"))
        out = out.join(
            bm, on=F.col(f"__rf_w{j}_probe") == F.col(f"__rf_w{j}"), how="left"
        )
        hit = (
            F.coalesce(F.col(f"__rf_bits{j}"), F.lit(0))
            .bitwiseAND(
                F.expr(f"shiftleft(1L, cast(pmod(__rf_pos{j}, 64) as int))")
            )
            != 0
        )
        out = out.withColumn(f"__rf_hit{j}", hit).drop(
            f"__rf_pos{j}", f"__rf_w{j}_probe", f"__rf_w{j}", f"__rf_bits{j}"
        )
    maybe = reduce(
        lambda a, b: a & b, [F.col(f"__rf_hit{j}") for j in range(num_hashes)]
    )
    return out.withColumn(_MAYBE, maybe).drop(
        *[f"__rf_hit{j}" for j in range(num_hashes)]
    )


def new_keys_via_bitmap(
    incoming: DataFrame,
    state: DataFrame,
    key_cols: list[str],
    m_bits: int,
    num_hashes: int = DEFAULT_NUM_HASHES,
    broadcast: bool = True,
) -> DataFrame:
    """EXACT anti-join: incoming rows whose key is absent from ``state``,
    with the state-side join bounded to bitmap-positive candidates.

    Two branches over the incoming scan (filters push down to the source on
    both, and in the incremental pattern the delta is the cheap side):

    - probe-negative rows are provably new — returned via a map-only branch
      that never touches state;
    - probe-positive rows (true hits + ~fpp false positives) anti-join
      against the distinct state keys; survivors are the verified-new rest.

    The union is bit-equal to ``incoming.join(state, keys, "left_anti")``.
    """
    # built once, probed num_hashes× by each of the two branches: persist so
    # the state scan happens one time (the persisted footprint is the bitmap
    # itself — ≤ m/64 rows — not the state). The standing-state pattern at
    # 100 TB persists it to storage beside the state instead (module doc).
    bitmap = keyset_bitmap(state, key_cols, m_bits, num_hashes).persist()
    probed = probe_bitmap(
        incoming, bitmap, key_cols, m_bits, num_hashes, broadcast=broadcast
    )
    definite_new = probed.filter(~F.col(_MAYBE)).drop(_MAYBE)
    candidates = probed.filter(F.col(_MAYBE)).drop(_MAYBE)
    verified_new = candidates.join(
        state.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    )
    return definite_new.unionByName(verified_new)
