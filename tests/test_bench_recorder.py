"""bench.py measurement machinery: best-of-2 bookkeeping and the
prior-gated third-run stall escape (r8 review fix 5) — the escape must be
EXCEPTIONAL (fires on a real regression vs the committed prior detail),
not a broad rule that re-runs every steady-state entry."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _bench():
    spec = importlib.util.spec_from_file_location("bench", ROOT / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


def _runner(counter: dict, t: float):
    def run():
        counter["n"] += 1
        return t

    return run


def test_third_run_prior_gated():
    b = _bench()
    rec = b._Recorder(budget_sec=1000, prior={"steady": 1.0, "stalled": 1.0})

    # steady entry at ~prior level: two runs, no escape
    c = {"n": 0}
    rec.record("steady", _runner(c, 1.05))
    assert c["n"] == 2 and "steady" not in rec.third_run

    # pair stalled well above the prior: escape fires once
    c = {"n": 0}
    rec.record("stalled", _runner(c, 3.0))
    assert c["n"] == 3 and rec.third_run == ["stalled"]

    # no prior for this entry: best-of-2 only (ADVICE r8 — the old
    # no-warm-up fallback triple-ran every new non-trivial entry on its
    # first sealed appearance while buying no stall signal)
    c = {"n": 0}
    rec.record("fresh", _runner(c, 0.9))
    assert c["n"] == 2 and "fresh" not in rec.third_run

    # trivially cheap entries never take a third run, prior or not
    c = {"n": 0}
    rec.record("cheap", _runner(c, 0.2))
    assert c["n"] == 2 and "cheap" not in rec.third_run


def test_third_run_gate_is_drift_scaled():
    """r9 review: on a host running uniformly 1.4x slower than the seal
    host (prior_scale from the start drift probe), an entry at 1.4x its
    prior is drift, not a stall — no third run; a genuine stall well past
    the scaled prior still fires. prior_scale never scales DOWN on a
    faster-than-reference host."""
    b = _bench()
    rec = b._Recorder(budget_sec=1000, prior={"e": 1.0, "s": 1.0}, prior_scale=1.4)
    c = {"n": 0}
    rec.record("e", _runner(c, 1.4))  # 1.4 <= 1.3 * 1.0 * 1.4
    assert c["n"] == 2 and "e" not in rec.third_run
    c = {"n": 0}
    rec.record("s", _runner(c, 3.0))  # 3.0 > 1.82: real stall
    assert c["n"] == 3 and "s" in rec.third_run

    fast = b._Recorder(budget_sec=1000, prior={"e": 1.0}, prior_scale=0.5)
    assert fast.prior_scale == 1.0  # clamped: never shrinks priors
    c = {"n": 0}
    fast.record("e", _runner(c, 1.05))
    assert c["n"] == 2 and "e" not in fast.third_run


def test_budget_exhaustion_skips_second_run():
    b = _bench()
    rec = b._Recorder(budget_sec=0.0, prior={})
    c = {"n": 0}
    rec.record("only_once", _runner(c, 2.0))
    assert c["n"] == 1
    assert rec.second_skipped == ["only_once"]
    assert rec.best["only_once"] == 2.0


def test_wav_bench_payloads_are_run_stable():
    """r8 review fix 6: the solo WAV micro-bench seeds from crc32(name),
    so the same case name builds byte-identical payloads every run (the
    salted builtin hash() it replaced changed per interpreter)."""
    import zlib

    spec = importlib.util.spec_from_file_location(
        "wav_decode_bench", ROOT / "scripts" / "wav_decode_bench.py"
    )
    wb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(wb)
    seed = zlib.crc32(b"16bit_stereo_1M") & 0xFFFF
    a = wb.mk_wav_np(16, 2, 1000, seed=seed)
    b2 = wb.mk_wav_np(16, 2, 1000, seed=seed)
    assert a == b2 and len(a) > 4000


def test_segment_normalized_total_under_intra_run_drift():
    """VERDICT r9 item 4: min-of-endpoints normalized the whole run by its
    fastest probe point; per-segment normalization divides each entry by
    the host speed it actually ran at. Scenario: host at 2x reference for
    the first segment, 1x for the second — the first segment's entries
    halve, the second's pass through, and uniform drift reduces to the old
    single-ratio division."""
    b = _bench()
    best = {"a": 2.0, "b": 4.0, "c": 3.0, "d": 1.0}
    order = ["a", "b", "c", "d"]
    ref = b.DRIFT_PROBE_REF_SEC
    # boundaries: start probe 2x ref, mid probe (after 2 entries) 2x ref,
    # end probe ... make segments flat so expectations are exact
    probes = [(0, 2 * ref), (2, 2 * ref), (4, 1 * ref)]
    # a, b in the 2x segment → (2+4)/2 = 3; c, d between probes at 2x and
    # 1x → ratio (2+1)/2 = 1.5 → (3+1)/1.5
    got = b._segment_normalized_total(best, order, probes, ref=ref)
    assert got == round((2.0 + 4.0) / 2 + (3.0 + 1.0) / 1.5, 3)
    # uniform drift == old behavior: every segment at the same ratio
    uniform = b._segment_normalized_total(
        best, order, [(0, 1.3 * ref), (4, 1.3 * ref)], ref=ref
    )
    assert uniform == round(10.0 / 1.3, 3)
    # no probes → raw sum (defensive)
    assert b._segment_normalized_total(best, order, [], ref=ref) == 10.0


def test_recorder_interleaves_probe_every_n_entries():
    b = _bench()
    calls = []
    rec = b._Recorder(budget_sec=1000, prior={}, probe=lambda: calls.append(1) or 0.7)
    rec.probes.append((0, 0.7))
    for i in range(25):
        rec.record(f"e{i}", lambda: 0.01)
    # probes fire BEFORE entries 11 and 21 (after 10 and 20 completions)
    assert len(calls) == 2
    assert [p[0] for p in rec.probes] == [0, 10, 20]
    assert rec.order == [f"e{i}" for i in range(25)]


def test_segment_normalized_total_properties():
    """Hypothesis pin for the r10 per-segment normalization: (a) the
    normalized total is bounded by the raw total divided by the max/min
    probe ratios; (b) scaling every probe AND every entry time by the same
    factor leaves the normalized total invariant (a uniformly k×-slower
    host normalizes back to the same number — the whole point)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    b = _bench()
    ref = b.DRIFT_PROBE_REF_SEC

    times = st.lists(st.floats(0.05, 30.0), min_size=1, max_size=20)
    probe_vals = st.lists(st.floats(0.2, 3.0), min_size=2, max_size=6)

    @settings(max_examples=100, deadline=None)
    @given(ts=times, pv=probe_vals, k=st.floats(0.5, 4.0))
    def check(ts, pv, k):
        order = [f"e{i}" for i in range(len(ts))]
        best = dict(zip(order, ts))
        # spread probe boundaries across the run, endpoints included
        n = len(ts)
        pts = [(round(i * n / (len(pv) - 1)), p) for i, p in enumerate(pv)]
        got = b._segment_normalized_total(best, order, pts, ref=ref)
        raw = sum(ts)
        lo = raw / max(max(pv) / ref, 0.01)
        hi = raw / max(min(pv) / ref, 0.01)
        assert lo - 0.01 <= got <= hi + 0.01, (got, lo, hi)
        # uniform-slowdown invariance: k× slower host, k× slower probes
        scaled = b._segment_normalized_total(
            {n_: t * k for n_, t in best.items()},
            order,
            [(i, p * k) for i, p in pts],
            ref=ref,
        )
        assert abs(scaled - got) <= max(0.02, 0.01 * got), (scaled, got)

    check()
