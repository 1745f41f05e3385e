"""Audio analysis operators over decoded PCM (training-data pipeline).

The reference engine has no multimodal surface at all (its six scalar types
stop at string/json — SURVEY §1.3); this module is north-star extension
work: the feature/filter pass an audio training-data pipeline runs after
``multimodal.decode_audio_stdlib`` proves the payloads decode. Analysis
features (zero-crossing rate, energy, peak, silence ratio) are the standard
first-stage audio quality filters (silence/clipping screens before ASR or
audio-LM training); the resampling primitives are the rate-normalization
step before batching.

Spark-first design: Arrow-batched ``mapInPandas`` with the same quarantine
contract as the image decoders (corrupt payload → NULL features, never a
task failure); all feature math is **exact integer arithmetic in int16
sample units** (sum of squares, strict sign-change counting, integer
thresholds), so encoder-derived payloads carry full value-hash SQL oracles
at the driver — the catalog query ``audio_features_wav`` pins the whole
decode→analyze pipeline bit-exactly. At 100 TB the op is embarrassingly
parallel (map-only over payload partitions, no shuffle); every entry point
selects (id, payload) BEFORE the Arrow exchange (``_id_payload``), since
Catalyst cannot column-prune into an opaque ``mapInPandas``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .multimodal import _wav_samples

_FEATURES_TAIL = (
    "n_bytes int, content_hash string, sample_rate int, "
    "n_samples int, zero_crossings int, sum_sq long, peak int, silence_cnt int"
)
FEATURES_SCHEMA = "doc_id long, " + _FEATURES_TAIL


# Internal id alias carried through the Arrow stage. PySpark's own
# mapInPandas re-selects each input column via ``self[col]``, which
# misresolves a dotted top-level name (``doc.id``) as a struct-field path
# (ADVICE r8) — so the entry points alias the caller's id to this safe
# name before mapInPandas and rename it back on the way out.
_AID = "__audio_id"


def _id_payload(df: DataFrame, id_col: str) -> tuple[DataFrame, str]:
    """Prune the input to (id, payload) BEFORE the Arrow exchange —
    Catalyst cannot column-prune into an opaque ``mapInPandas``, so
    without this select every input column ships to Python per batch.
    Returns the pruned frame (id aliased to ``_AID``, see above) plus the
    id column's DDL type so output schemas carry the caller's id name and
    type instead of a hard-coded ``doc_id long``."""
    for c in (id_col, "payload"):
        if c not in df.columns:
            raise ValueError(f"audio operators need column {c!r} in the input")
    if "`" in id_col:
        raise ValueError(f"id column name {id_col!r} contains a backtick")
    # backticked ref so a dotted top-level id column (e.g. "doc.id")
    # selects the column itself, not a nested-field path (the _bt
    # convention in operators/filters.py)
    return (
        df.select(F.col(f"`{id_col}`").alias(_AID), F.col("payload")),
        df.schema[id_col].dataType.simpleString(),
    )


def _pcm_int16(samples) -> np.ndarray:
    """Recover exact int16 units from the decoder's [-1, 1] floats (the
    decoder divides by 32768, a power of two, so the float is exact and the
    round-trip is lossless for mono 16-bit PCM). Vectorized: np.rint is
    round-half-to-even, identical to Python's round(); values are < 2^53 so
    the float64 → int64 cast is exact. int64 (not int16) because channel
    AVERAGES of multi-channel clips can carry fractional .5 units that
    round to the full int16 range and because downstream math (squares,
    sums) must not wrap."""
    return np.rint(np.asarray(samples, dtype=np.float64) * 32768).astype(
        np.int64
    )


def pcm_features(v, silence_threshold: int = 1024) -> tuple:
    """Exact integer features over int16 samples: strict sign-change count
    (v[i]·v[i+1] < 0 — zero samples break runs, matching the textbook ZCR
    definition), energy as the exact sum of squares, peak magnitude, and
    the count of samples below the silence threshold.

    All int64 numpy (VERDICT r6 item 5 — the per-sample Python loops were
    10-100× off on real 10⁶-sample clips): products of int16-range values
    fit int64 with no overflow (max |v|=32768 → v² ≤ 2^30; sum over 10⁹
    samples ≤ 2^60), and every reduction is bit-identical to the scalar
    definition it replaces."""
    v = np.asarray(v, dtype=np.int64)
    zc = int(np.count_nonzero(v[:-1] * v[1:] < 0)) if v.size > 1 else 0
    sum_sq = int(np.dot(v, v))
    peak = int(np.max(np.abs(v))) if v.size else 0
    silence = int(np.count_nonzero(np.abs(v) < silence_threshold))
    return zc, sum_sq, peak, silence


def decimate(v, factor: int):
    """Strided decimation (every ``factor``-th sample, no anti-alias
    filter) — the cheapest integer-exact downsampler."""
    if factor < 1:
        raise ValueError("factor must be >= 1")
    return v[::factor]


def resample_linear(v, out_n: int) -> list[float]:
    """Linear-interpolation resample to ``out_n`` samples over the same
    time span, evaluated at exact rational positions j·(n−1)/(out_n−1).
    Deterministic: interpolation arithmetic is integer until the final
    single division, so equal inputs give bit-equal outputs everywhere.

    Vectorized int64 numpy, bit-identical to the scalar form it replaces:
    the numerator v[k]·(d−rem) + v[k+1]·rem is ≤ 2·32768·out_n — exact in
    int64 AND in float64 (< 2^53), so the single float64 divide is the same
    correctly-rounded result CPython's int/int true division produces."""
    v = np.asarray(v, dtype=np.int64)
    n = v.size
    if out_n < 1:
        raise ValueError("out_n must be >= 1")
    if n == 0:
        return []
    if n == 1 or out_n == 1:
        return [float(v[0])] * out_n
    d = out_n - 1
    num = np.arange(out_n, dtype=np.int64) * (n - 1)
    k, rem = np.divmod(num, d)
    kp1 = np.minimum(k + 1, n - 1)  # k+1 is only read where rem > 0
    numer = v[k] * (d - rem) + v[kp1] * rem
    out = np.where(
        rem == 0, v[k].astype(np.float64), numer.astype(np.float64) / d
    )
    return out.tolist()


def audio_features(
    df: DataFrame, id_col: str = "doc_id", silence_threshold: int = 1024
) -> DataFrame:
    """Decode WAV payloads and compute the exact-integer analysis features
    in one Arrow-batched pass: ``(sample_rate, n_samples, zero_crossings,
    sum_sq, peak, silence_cnt)``. Quarantine: undecodable payloads keep
    their (n_bytes, content_hash) forensics with NULL features."""
    df, id_type = _id_payload(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, hashes = [], []
            rates, counts = [], []
            zcs, energies, peaks, silences = [], [], [], []
            for payload in pdf["payload"]:
                data = bytes(payload)
                n_bytes.append(len(data))
                hashes.append(hashlib.md5(data).hexdigest())
                decoded = _wav_samples(data)
                if decoded is None:
                    for col in (rates, counts, zcs, energies, peaks, silences):
                        col.append(None)
                    continue
                rate, _nch, samples = decoded
                v = _pcm_int16(samples)
                zc, sum_sq, peak, silence = pcm_features(v, silence_threshold)
                rates.append(rate)
                counts.append(len(v))
                zcs.append(zc)
                energies.append(sum_sq)
                peaks.append(peak)
                silences.append(silence)
            yield pd.DataFrame(
                {
                    _AID: pdf[_AID],
                    "n_bytes": pd.array(n_bytes, dtype="int32"),
                    "content_hash": hashes,
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_samples": pd.array(counts, dtype="Int32"),
                    "zero_crossings": pd.array(zcs, dtype="Int32"),
                    "sum_sq": pd.array(energies, dtype="Int64"),
                    "peak": pd.array(peaks, dtype="Int32"),
                    "silence_cnt": pd.array(silences, dtype="Int32"),
                }
            )

    return df.mapInPandas(
        run, schema=f"{_AID} {id_type}, {_FEATURES_TAIL}"
    ).withColumnRenamed(_AID, id_col)


def clipping_features(v, clip_threshold: int = 24576) -> tuple:
    """ASR-prep clipping screen (VERDICT r7 item 8): ``(clip_count,
    max_clip_run)`` — how many samples sit at/above the clipping magnitude
    and the longest CONSECUTIVE run of them (sustained clipping is what
    actually ruins a training clip; isolated peaks are often fine). Exact
    integer over int16-range values, fully vectorized: run lengths fall out
    of a diff over the padded clip mask (starts where the mask rises, ends
    where it falls), no Python loop at any clip length."""
    v = np.asarray(v, dtype=np.int64)
    mask = np.abs(v) >= clip_threshold
    clip_count = int(np.count_nonzero(mask))
    if clip_count == 0:
        return 0, 0
    edges = np.diff(np.concatenate(([0], mask.astype(np.int8), [0])))
    starts = np.flatnonzero(edges == 1)
    ends = np.flatnonzero(edges == -1)
    return clip_count, int(np.max(ends - starts))


def audio_quality_screen(
    df: DataFrame, id_col: str = "doc_id", clip_threshold: int = 24576
) -> DataFrame:
    """Decode WAV payloads and compute the clipping screen in one
    Arrow-batched pass: ``(n_samples, clip_count, max_clip_run)``. Same
    quarantine semantics as :func:`audio_features` (undecodable → NULLs).
    Map-only at any scale — prunes to (id, payload), no shuffle."""
    df, id_type = _id_payload(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts, clips, runs = [], [], []
            for payload in pdf["payload"]:
                decoded = _wav_samples(bytes(payload))
                if decoded is None:
                    counts.append(None)
                    clips.append(None)
                    runs.append(None)
                    continue
                _rate, _nch, samples = decoded
                v = _pcm_int16(samples)
                clip_count, max_run = clipping_features(v, clip_threshold)
                counts.append(len(v))
                clips.append(clip_count)
                runs.append(max_run)
            yield pd.DataFrame(
                {
                    _AID: pdf[_AID],
                    "n_samples": pd.array(counts, dtype="Int32"),
                    "clip_count": pd.array(clips, dtype="Int32"),
                    "max_clip_run": pd.array(runs, dtype="Int32"),
                }
            )

    return df.mapInPandas(
        run,
        schema=f"{_AID} {id_type}, n_samples int, clip_count int, max_clip_run int",
    ).withColumnRenamed(_AID, id_col)


def audio_resample(
    df: DataFrame, out_n: int, id_col: str = "doc_id"
) -> DataFrame:
    """Rate-normalization pass: decode, linear-resample every clip to
    ``out_n`` samples, and report the resampled peak + sum of |rounded|
    values (integer-exact after rounding, so unit tests can pin values).
    Same batch shape and quarantine semantics as :func:`audio_features`."""
    df, id_type = _id_payload(df, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts, peaks, abs_sums = [], [], []
            for payload in pdf["payload"]:
                decoded = _wav_samples(bytes(payload))
                if decoded is None:
                    counts.append(None)
                    peaks.append(None)
                    abs_sums.append(None)
                    continue
                _rate, _nch, samples = decoded
                # np.rint = round-half-even, identical to Python round()
                r = np.rint(
                    np.asarray(resample_linear(_pcm_int16(samples), out_n))
                ).astype(np.int64)
                counts.append(int(r.size))
                peaks.append(int(np.max(np.abs(r))) if r.size else 0)
                abs_sums.append(int(np.sum(np.abs(r))))
            yield pd.DataFrame(
                {
                    _AID: pdf[_AID],
                    "out_samples": pd.array(counts, dtype="Int32"),
                    "peak": pd.array(peaks, dtype="Int32"),
                    "abs_sum": pd.array(abs_sums, dtype="Int64"),
                }
            )

    return df.mapInPandas(
        run, schema=f"{_AID} {id_type}, out_samples int, peak int, abs_sum long"
    ).withColumnRenamed(_AID, id_col)
