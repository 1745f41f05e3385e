"""Solo micro-bench for the vectorized WAV decoder (VERDICT r7 item 1).

The r8 refactor replaced the per-sample/per-channel Python loop in
``operators.multimodal._wav_samples`` with ``np.frombuffer`` per-channel
columns (sequential channel accumulation preserves the scalar float
addition order bit for bit — parity pinned by
``tests/test_audio.py::test_vectorized_decoder_bit_identical_to_scalar_reference``).
This script prices that swap ALONE, outside Spark, on real-clip sample
counts (>=10**6) where the old loop dominated ``audio_features_wav`` /
``multimodal_decode_wav`` wall time: it times the preserved scalar
reference (the r1-r7 shipped code, kept verbatim in tests) against the
shipped vectorized decoder on identical payloads and asserts bit identity
while it's at it.

Run: ``python scripts/wav_decode_bench.py``  →  one JSON line.
"""

from __future__ import annotations

import json
import struct
import sys
import time
import zlib
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from embulk_executor_mapreduce_spark.operators.multimodal import (  # noqa: E402
    _wav_samples,
)
from tests.test_audio import _scalar_wav_reference  # noqa: E402


def mk_wav_np(bits: int, nch: int, n: int, seed: int, rate: int = 16000) -> bytes:
    """Deterministic PCM WAV, numpy-generated (the tests' _mk_wav builds
    frames with a Python loop — fine at 64 samples, minutes at 10**6)."""
    rng = np.random.default_rng(seed)
    if bits == 16:
        frames = rng.integers(-32768, 32768, size=n * nch, dtype=np.int64)
        frames = frames.astype("<i2").tobytes()
    else:
        frames = rng.integers(0, 256, size=n * nch, dtype=np.int64)
        frames = frames.astype(np.uint8).tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, nch, rate, rate * nch * bits // 8, nch * bits // 8, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(frames)) + frames
    if len(frames) % 2:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def main() -> None:
    cases = [
        ("16bit_stereo_1M", 16, 2, 1_000_000),
        ("16bit_mono_1M", 16, 1, 1_000_000),
        ("8bit_stereo_1M", 8, 2, 1_000_000),
        ("16bit_stereo_4M", 16, 2, 4_000_000),
    ]
    out: dict[str, dict[str, float]] = {}
    for name, bits, nch, n in cases:
        # zlib.crc32 is a stable digest: unlike the salted builtin hash(),
        # the same case name seeds the same payload on every run, so the
        # recorded scalar/vectorized timings compare run to run
        payload = mk_wav_np(bits, nch, n, seed=zlib.crc32(name.encode()) & 0xFFFF)
        t0 = time.perf_counter()
        want = _scalar_wav_reference(payload)
        t_scalar = time.perf_counter() - t0
        t0 = time.perf_counter()
        got = _wav_samples(payload)
        t_vec = time.perf_counter() - t0
        assert got[0] == want[0] and got[1] == want[1]
        # got[2] is an ndarray since r9; exact per-bit list compare
        assert got[2].tolist() == want[2], f"{name}: bit mismatch"
        out[name] = {
            "scalar_sec": round(t_scalar, 4),
            "vectorized_sec": round(t_vec, 4),
            "speedup": round(t_scalar / t_vec, 2),
        }
    print(
        json.dumps(
            {
                "metric": "wav_decode_scalar_vs_vectorized",
                "unit": "sec",
                "bit_identical": True,
                "cases": out,
            }
        )
    )


if __name__ == "__main__":
    main()
