"""Audio analysis operators (operators/audio.py): exact-integer feature
math, resampling primitives, DataFrame batch shape + quarantine, and an
INDEPENDENT decode reference (stdlib ``wave``) so the feature pipeline is
not self-referee'd against the repo's own RIFF parser."""

from __future__ import annotations

import io
import wave

import pytest

from embulk_executor_mapreduce_spark.operators.audio import (
    _pcm_int16,
    audio_features,
    audio_resample,
    decimate,
    pcm_features,
    resample_linear,
)
from embulk_executor_mapreduce_spark.operators.multimodal import (
    _wav_samples,
    encode_wav_pcm16,
)


def test_pcm_features_hand_computed():
    v = [0, 100, -100, 100, 0, 5000]
    zc, sum_sq, peak, silence = pcm_features(v)
    assert zc == 2  # only the strict sign flips; zeros break runs
    assert sum_sq == 100**2 * 3 + 5000**2
    assert peak == 5000
    assert silence == 5  # |x| < 1024 for all but the 5000


def test_pcm_features_empty_and_threshold():
    assert pcm_features([]) == (0, 0, 0, 0)
    assert pcm_features([10, -10], silence_threshold=5) == (1, 200, 10, 0)


def test_decimate():
    assert decimate([1, 2, 3, 4, 5], 2) == [1, 3, 5]
    assert decimate([1, 2, 3], 1) == [1, 2, 3]
    with pytest.raises(ValueError):
        decimate([1], 0)


def test_resample_linear_exact_positions():
    # 4 -> 7 samples: positions j/2 over [0,3] hit every half-step exactly
    assert resample_linear([0, 10, 20, 30], 7) == [0, 5, 10, 15, 20, 25, 30]
    # identity when out_n == n
    assert resample_linear([3, 1, 4], 3) == [3.0, 1.0, 4.0]
    # degenerate shapes
    assert resample_linear([7], 5) == [7.0] * 5
    assert resample_linear([5, 9], 1) == [5.0]
    assert resample_linear([], 3) == []
    with pytest.raises(ValueError):
        resample_linear([1, 2], 0)


def test_stdlib_wave_independent_decode_reference():
    """encode_wav_pcm16 → repo RIFF decoder must agree bit-for-bit with
    Python's stdlib ``wave`` module on the recovered int16 samples."""
    ints = [0, 1, -1, 32767, -32768, 12345, -12345, 128]
    payload = encode_wav_pcm16(ints, sample_rate=8000)
    rate, nch, samples = _wav_samples(payload)
    assert (rate, nch) == (8000, 1)
    assert list(_pcm_int16(samples)) == ints
    with wave.open(io.BytesIO(payload)) as w:
        assert w.getframerate() == 8000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        raw = w.readframes(w.getnframes())
    ref = [
        int.from_bytes(raw[i : i + 2], "little", signed=True)
        for i in range(0, len(raw), 2)
    ]
    assert ref == list(_pcm_int16(samples))


def test_audio_features_df_and_quarantine(spark):
    good = encode_wav_pcm16([1000, -1000, 0, 500], sample_rate=4000)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a wav"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in audio_features(df).collect()}
    g = rows[1]
    assert (g.sample_rate, g.n_samples) == (4000, 4)
    # all four samples sit below the 1024 default silence threshold
    assert (g.zero_crossings, g.sum_sq, g.peak, g.silence_cnt) == (
        1,
        1000**2 * 2 + 500**2,
        1000,
        4,
    )
    bad = rows[2]
    assert bad.n_bytes == 9 and bad.content_hash is not None
    assert bad.sample_rate is None and bad.sum_sq is None


def test_audio_resample_df(spark):
    # ramp 0..30 step 10 resampled to 7 → [0,5,10,15,20,25,30]
    payload = encode_wav_pcm16([0, 10, 20, 30])
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    r = audio_resample(df, 7).collect()[0]
    assert (r.out_samples, r.peak, r.abs_sum) == (7, 30, 0 + 5 + 10 + 15 + 20 + 25 + 30)


def test_audio_chain_never_raises_on_mutated_valid_wavs():
    """Mutation fuzz one level past random-bytes: start from VALID encoded
    WAVs (which reach deep into the RIFF walk and PCM math), then flip
    bytes, truncate, and extend — the decode → int16 → features → resample
    chain must return values or None, never raise (the quarantine
    contract audio_features relies on inside mapInPandas)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = encode_wav_pcm16([0, 1, -1, 32767, -32768, 500, -500, 12345] * 4,
                            sample_rate=16000)

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(0, len(base) - 1),
        st.integers(0, 255),
        st.integers(0, len(base)),
        st.binary(max_size=32),
    )
    def run(flip_at, new_byte, trunc, tail):
        data = bytearray(base)
        data[flip_at] = new_byte
        mutated = bytes(data[:trunc]) + tail
        try:
            decoded = _wav_samples(mutated)
            if decoded is not None:
                _rate, _nch, samples = decoded
                v = _pcm_int16(samples)
                pcm_features(v)
                resample_linear(v, 8)
                decimate(v, 3)
        except Exception as exc:  # noqa: BLE001
            raise AssertionError(f"audio chain raised on mutation: {exc!r}")

    run()


def _scalar_wav_reference(data: bytes):
    """Per-sample scalar decoder — the r1-r7 shipped implementation of
    multimodal._wav_samples, preserved here VERBATIM as the bit-identity
    reference now that the shipped decoder is the vectorized numpy twin
    (VERDICT r7 item 1; the roles of twin and shipped code swapped when the
    refactor landed in r8). Sequential channel accumulation (c0 + c1 + ...
    then / nch) defines the float addition order the vectorized decoder
    must reproduce bit for bit."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (sz,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or raw is None or len(fmt) < 16:
        return None
    audio_fmt, nch, rate, _br, _al, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1 or nch == 0 or rate == 0 or bits not in (8, 16):
        return None
    width = bits // 8
    frame = width * nch
    n = len(raw) // frame
    samples = []
    for i in range(n):
        acc = 0.0
        for c in range(nch):
            o = i * frame + c * width
            if bits == 16:
                acc += (
                    int.from_bytes(raw[o : o + 2], "little", signed=True)
                    / 32768.0
                )
            else:
                acc += (raw[o] - 128) / 128.0
        samples.append(acc / nch)
    return rate, nch, samples


def _mk_wav(rng, bits, nch, n, rate=8000):
    import struct

    if bits == 16:
        frames = b"".join(
            struct.pack("<h", rng.randint(-32768, 32767))
            for _ in range(n * nch)
        )
    else:
        frames = bytes(rng.randint(0, 255) for _ in range(n * nch))
    fmt = struct.pack(
        "<HHIIHH", 1, nch, rate, rate * nch * bits // 8, nch * bits // 8, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(frames)) + frames
    if len(frames) % 2:
        chunks += b"\x00"  # RIFF word alignment
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_vectorized_decoder_bit_identical_to_scalar_reference():
    """The shipped vectorized decoder must agree with the preserved scalar
    reference on every sample bit — across 8/16-bit, 1/2/3 channels, odd
    chunk padding, and pathological amplitudes."""
    import random

    rng = random.Random(20260814)
    cases = [(16, 1, 64), (16, 2, 33), (16, 3, 17), (8, 1, 50), (8, 2, 25),
             (8, 3, 11), (16, 2, 1), (16, 1, 0)]
    for bits, nch, n in cases:
        payload = _mk_wav(rng, bits, nch, n)
        got = _wav_samples(payload)
        want = _scalar_wav_reference(payload)
        assert (got is None) == (want is None), (bits, nch, n)
        if want is None:
            continue
        assert got[0] == want[0] and got[1] == want[1]
        assert len(got[2]) == len(want[2])
        for a, b in zip(got[2], want[2]):
            assert a == b and (a == 0.0 or str(a) == str(b)), (bits, nch, n, a, b)
        # r9 ndarray contract (VERDICT r8 item 6): no per-clip .tolist()
        import numpy as np

        assert isinstance(got[2], np.ndarray) and got[2].dtype == np.float64


def test_clipping_features_hand_computed():
    from embulk_executor_mapreduce_spark.operators.audio import (
        clipping_features,
    )

    # runs merge across sign flips (the screen tests |v|)
    assert clipping_features([30000, -30000, 0, 30000]) == (3, 2)
    assert clipping_features([]) == (0, 0)
    assert clipping_features([100, -200, 0]) == (0, 0)
    assert clipping_features([32767] * 5) == (5, 5)
    # threshold is inclusive
    assert clipping_features([24576, 24575]) == (1, 1)
    assert clipping_features([1, 30000, 30000, 1, 30000]) == (3, 2)
    assert clipping_features([30000, 1, 30000, 30000, 30000]) == (4, 3)


def test_clipping_features_matches_scalar_reference():
    """Vectorized run-length math vs an obvious per-sample loop."""
    import random

    from embulk_executor_mapreduce_spark.operators.audio import (
        clipping_features,
    )

    def scalar(v, thr=24576):
        count = run = best = 0
        for s in v:
            if abs(s) >= thr:
                count += 1
                run += 1
                best = max(best, run)
            else:
                run = 0
        return count, best

    rng = random.Random(8)
    for trial in range(50):
        n = rng.randrange(0, 40)
        # skew amplitudes so clipping is common and runs form
        v = [
            rng.choice([0, 1000, -25000, 30000, -32768, 32767, 24576, 24575])
            for _ in range(n)
        ]
        assert clipping_features(v) == scalar(v), v


def test_audio_ops_honor_id_col_name_and_type(spark):
    """``id_col`` is a real parameter (r8 review): the output id column
    keeps the caller's NAME and TYPE — the previous hard-coded ``doc_id
    long`` schema silently renamed the id and made any non-long id an
    Arrow cast failure inside a task. Missing id/payload columns raise
    plan-time ValueError, not a task failure."""
    from embulk_executor_mapreduce_spark.operators.audio import (
        audio_quality_screen,
    )

    good = encode_wav_pcm16([30000, 30000, -30000, 100], sample_rate=4000)
    df = spark.createDataFrame(
        [("u1", bytearray(good), "wide " * 50)],
        "url_id string, payload binary, extra string",
    )
    ops = {
        "features": lambda d: audio_features(d, id_col="url_id"),
        "screen": lambda d: audio_quality_screen(d, id_col="url_id"),
        "resample": lambda d: audio_resample(d, 3, id_col="url_id"),
    }
    for name, op in ops.items():
        out = op(df)
        assert out.columns[0] == "url_id", name
        assert dict(out.dtypes)["url_id"] == "string", name
        assert out.collect()[0].url_id == "u1", name
    srow = ops["screen"](df).collect()[0]
    # |30000|,|30000|,|-30000| >= 24576 and consecutive; 100 is not
    assert (srow.n_samples, srow.clip_count, srow.max_clip_run) == (4, 3, 3)
    with pytest.raises(ValueError, match="payload"):
        audio_features(df.drop("payload"), id_col="url_id")
    with pytest.raises(ValueError, match="url_id"):
        audio_quality_screen(df.drop("url_id"), id_col="url_id")


def test_audio_ops_accept_dotted_id_column(spark):
    """ADVICE r8: a dotted TOP-LEVEL id column ("doc.id") must select as
    the column itself, not misresolve as a nested-field reference inside
    planning — the entry points backtick refs like operators/filters._bt."""
    from embulk_executor_mapreduce_spark.operators.audio import (
        audio_quality_screen,
    )

    good = encode_wav_pcm16([30000, 30000, -30000, 100], sample_rate=4000)
    df = spark.createDataFrame(
        [("d7", bytearray(good))], "`doc.id` string, payload binary"
    )
    for op in (
        lambda d: audio_features(d, id_col="doc.id"),
        lambda d: audio_quality_screen(d, id_col="doc.id"),
        lambda d: audio_resample(d, 3, id_col="doc.id"),
    ):
        out = op(df)
        assert out.columns[0] == "doc.id"
        assert out.collect()[0]["doc.id"] == "d7"


def test_audio_ops_prune_input_before_arrow_exchange(spark, tmp_path):
    """Catalyst cannot column-prune into an opaque mapInPandas, so the
    entry points select (id, payload) FIRST — a wide unused column must
    not reach the scan (ReadSchema) or the Arrow exchange."""
    good = encode_wav_pcm16([1, 2, 3], sample_rate=4000)
    src = str(tmp_path / "clips")
    spark.createDataFrame(
        [(1, bytearray(good), "x" * 100)],
        "doc_id long, payload binary, extra_wide string",
    ).write.parquet(src)
    out = audio_features(spark.read.parquet(src))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "extra_wide" not in plan
