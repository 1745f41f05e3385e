"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata.

The Spark-side machinery is real — BinaryType columns, metadata structs,
Arrow-batched ``mapInPandas`` decode pipelines with correct schemas and batch
shapes. Media decoding is REAL on every container (r5): :func:`decode`
dispatches to Pillow when that optional dependency is importable
(:func:`decode_image_pil` — C speed, every format), else to the
stdlib-only PNG/BMP/PPM decoder (:func:`decode_image_stdlib` — zlib
inflate + PNG unfilter, no dependencies), so the real-decode path is
CI-provable everywhere. :func:`decode_stub` remains for plumbing-only
benches. Frame sampling probes for an ffmpeg binary
(:func:`ffmpeg_available`).

Parallelism note: a REAL decoder (10-100 ms/item CPU) must not inherit a
narrow scan's partitioning — wrap the input in
``partitioning.spread_narrow(df, id_col)`` so the Python workers fan out
across the cluster. The stubs deliberately do NOT spread: the fake decode is
memory-bandwidth-bound (measured at sf0.1: the spread's shuffle + 32-worker
fan-out costs more than it saves), and an unconditional shuffle here would be
pure overhead stacked on every real deployment that already lands wide.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes int, content_hash string, "
    "features array<float>, width int, height int"
)


# Internal id/value aliases carried through the Arrow stage (same contract
# as operators/audio._AID). PySpark's own mapInPandas re-selects each input
# column via ``self[col]``, which misresolves a dotted top-level name
# ("doc.id", "my.text") as a struct-field path (ADVICE r8 for the id,
# ADVICE r9 for the value column) — so every entry point below aliases the
# caller's id AND value to these safe names before mapInPandas.
_MID = "__mm_id"
_MVAL = "__mm_val"


def _mid_input(df: DataFrame, id_col: str, value_col: str):
    """Prune the input to (id, value) BEFORE the Arrow exchange — Catalyst
    cannot column-prune into an opaque ``mapInPandas``, so without this
    select every input column ships to Python per batch — with the id
    aliased to ``_MID`` and the value (payload or caller-named text) to
    ``_MVAL`` (see above). Returns the pruned frame plus the id column's
    DDL type (for entry points that propagate the caller's id name/type
    into their output schema)."""
    for c in (id_col, value_col):
        if c not in df.columns:
            raise ValueError(
                f"multimodal operators need column {c!r} in the input"
            )
    if "`" in id_col or "`" in value_col:
        raise ValueError("column names must not contain backticks")
    return (
        df.select(
            F.col(f"`{id_col}`").alias(_MID),
            F.col(f"`{value_col}`").alias(_MVAL),
        ),
        df.schema[id_col].dataType.simpleString(),
    )


def to_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Binary ingestion surface: typed binary payload + metadata struct.
    (Real pipelines land here via ``spark.read.format('binaryFile')``.)"""
    if "`" in id_col or "`" in text_col:
        raise ValueError("column names must not contain backticks")
    # backticked refs: dotted top-level names select the column itself
    payload = F.encode(F.col(f"`{text_col}`"), "UTF-8")
    return df.select(
        F.col(f"`{id_col}`"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def from_binary_files(
    df: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """Adapt ``spark.read.format('binaryFile')`` rows (path, length, content)
    to the decode-pipeline surface: stable 64-bit id from the file path,
    binary payload, metadata struct. This is the real multimodal ingestion
    edge — the `binaryfile` spec source feeds it."""
    payload = F.col(content_col)
    return df.select(
        F.xxhash64(F.col(path_col)).alias("doc_id"),
        F.col(path_col).alias("path"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
        ).alias("meta"),
    )


def pil_available() -> bool:
    """True when Pillow is importable on the DRIVER. Executors share the
    container image in every supported deployment, so a driver-side probe is
    the dispatch signal; the worker-side import failing anyway classifies as
    an infra error (missing dependency), which is the correct surface."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def ffmpeg_available() -> bool:
    """True when an ffmpeg binary is on PATH (frame sampling)."""
    import shutil

    return shutil.which("ffmpeg") is not None


def decode_image_pil(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL image decode via Pillow — same mapInPandas batch shape, schema,
    and partitioning as :func:`decode_stub`, with actual pixel dimensions
    and a 4-float luminance-quadrant feature vector (mean brightness of the
    2×2 downsample — a real, if tiny, content feature). Payloads Pillow
    cannot parse keep the metadata columns and yield NULL features/dims
    (decode failures are data, not crashes — quarantine-style semantics).

    A real decoder is CPU-bound (~10-100 ms/item): callers landing from a
    narrow scan should wrap the input in ``spread_narrow`` first (module
    docstring) — the stub deliberately doesn't, the real path should.
    """
    df, _ = _mid_input(df, id_col, "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            n_bytes, hashes, feats, widths, heights = [], [], [], [], []
            for payload in pdf[_MVAL]:
                data = bytes(payload)
                n_bytes.append(len(data))
                hashes.append(hashlib.md5(data).hexdigest())
                try:
                    img = Image.open(io.BytesIO(data))
                    w, h = img.size
                    small = img.convert("L").resize((2, 2))
                    px = list(small.getdata())
                    feats.append([p / 255.0 for p in px])
                    widths.append(w)
                    heights.append(h)
                except Exception:  # noqa: BLE001 — unparseable payload = data
                    feats.append(None)
                    widths.append(None)
                    heights.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[_MID],
                    "n_bytes": pd.array(n_bytes, dtype="int32"),
                    "content_hash": hashes,
                    "features": feats,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                }
            )

    return df.mapInPandas(run, schema=DECODE_SCHEMA)


def _png_pixels(data: bytes):
    """Minimal stdlib PNG decoder: 8-bit greyscale/RGB/palette/alpha,
    non-interlaced. Returns (width, height, luminance rows) or None if the
    payload isn't a PNG this decoder handles (corrupt chunk data included —
    every stdlib decoder shares the never-raise quarantine contract, fuzz-
    pinned). Full pipeline: chunk walk → zlib inflate → per-row unfilter
    (none/sub/up/average/paeth) → ITU-R 601 luminance. Pure Python per-row
    loops — the CI-provable correctness path; the Pillow dispatch (C speed)
    is preferred where installed."""
    import zlib

    try:
        return _png_pixels_inner(data)
    except (IndexError, ValueError, zlib.error):
        return None


def _png_pixels_inner(data: bytes):
    import struct
    import zlib

    if not data.startswith(b"\x89PNG\r\n\x1a\n"):
        return None
    pos, ihdr, idat, plte = 8, None, b"", None
    while pos + 8 <= len(data):
        (ln,), typ = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        pos += 8
        chunk = data[pos : pos + ln]
        pos += ln + 4  # payload + CRC
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"PLTE":
            plte = chunk
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or w == 0 or h == 0:
        return None
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if nch is None or (color == 3 and plte is None):
        return None
    raw = zlib.decompress(idat)
    stride = w * nch
    if len(raw) < h * (stride + 1):
        return None
    prev = bytearray(stride)
    lum_rows = []
    p = 0
    for _y in range(h):
        f = raw[p]
        p += 1
        line = bytearray(raw[p : p + stride])
        p += stride
        if f == 1:  # sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif f == 2:  # up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # average
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                line[i] = (line[i] + (a if pa <= pb and pa <= pc else b if pb <= pc else c)) & 0xFF
        elif f != 0:
            return None
        prev = line
        row = []
        for x in range(w):
            o = x * nch
            if color == 0 or color == 4:  # grey (+alpha)
                row.append(float(line[o]))
            elif color == 3:  # palette index
                i3 = line[o] * 3
                r, g, b = plte[i3], plte[i3 + 1], plte[i3 + 2]
                row.append(0.299 * r + 0.587 * g + 0.114 * b)
            else:  # RGB / RGBA
                row.append(
                    0.299 * line[o] + 0.587 * line[o + 1] + 0.114 * line[o + 2]
                )
        lum_rows.append(row)
    return w, h, lum_rows


def _bmp_pixels(data: bytes):
    """Minimal stdlib BMP decoder: 24-bit uncompressed (BI_RGB), bottom-up
    or top-down. Returns (width, height, luminance rows) or None (never
    raises — shared quarantine contract)."""
    import struct

    try:
        if len(data) < 54 or data[:2] != b"BM":
            return None
        px_off = struct.unpack("<I", data[10:14])[0]
        w, h_signed = struct.unpack("<ii", data[18:26])
        bpp, compression = struct.unpack("<HI", data[28:34])
        if bpp != 24 or compression != 0 or w <= 0 or h_signed == 0:
            return None
        h = abs(h_signed)
        row_bytes = (w * 3 + 3) & ~3
        if len(data) < px_off + row_bytes * h:
            return None
        rows = []
        for y in range(h):
            src_y = (h - 1 - y) if h_signed > 0 else y  # positive = bottom-up
            o = px_off + src_y * row_bytes
            row = []
            for x in range(w):
                b, g, r = data[o + 3 * x], data[o + 3 * x + 1], data[o + 3 * x + 2]
                row.append(0.299 * r + 0.587 * g + 0.114 * b)
            rows.append(row)
        return w, h, rows
    except (IndexError, ValueError, OverflowError):
        return None


def _ppm_pixels(data: bytes):
    """Minimal stdlib PPM decoder: P6 (binary RGB, maxval ≤ 255).
    Returns (width, height, luminance rows) or None (never raises —
    shared quarantine contract)."""
    try:
        return _ppm_pixels_inner(data)
    except (IndexError, ValueError, OverflowError):
        return None


def _ppm_pixels_inner(data: bytes):
    if not data.startswith(b"P6"):
        return None
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(data):
        c = data[pos : pos + 1]
        if c == b"#":  # comment to end of line
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(data) and not data[pos : pos + 1].isspace():
                pos += 1
            if not data[start:pos].isdigit():
                return None
            fields.append(int(data[start:pos]))
    if len(fields) < 3:
        return None
    w, h, maxval = fields
    pos += 1  # single whitespace after maxval
    if w == 0 or h == 0 or maxval == 0 or maxval > 255:
        return None
    if len(data) < pos + w * h * 3:
        return None
    scale = 255.0 / maxval
    rows = []
    for y in range(h):
        o = pos + y * w * 3
        row = []
        for x in range(w):
            r, g, b = data[o + 3 * x], data[o + 3 * x + 1], data[o + 3 * x + 2]
            row.append((0.299 * r + 0.587 * g + 0.114 * b) * scale)
        rows.append(row)
    return w, h, rows


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU-T T.81 sequential DCT, Huffman): real multimodal corpora
# are overwhelmingly JPEG, so the stdlib decode path must cover it (VERDICT
# r5 item 2). Decoder: marker walk → Huffman entropy decode (all components,
# to advance the bitstream correctly) → dequant + numpy IDCT of the LUMA
# blocks only (the feature surface is luminance; chroma IDCT would be wasted
# work) → nearest-neighbor luma upsample for the rare subsampled-Y case.
# Handles grayscale + interleaved YCbCr single-scan, arbitrary sampling
# factors, 8/16-bit quant tables, restart markers. Progressive (SOF2),
# arithmetic coding, and 12-bit precision return None (→ NULL features, the
# quarantine-style failure surface shared by all stdlib decoders).
# ---------------------------------------------------------------------------

#: JPEG zigzag order as (row=v, col=u) pairs, generated rather than typed
#: (odd diagonals walk row-increasing, even ones row-decreasing — T.81 Fig 5)
_ZIGZAG = [
    (r, s - r)
    for s in range(15)
    for r in (
        lambda rng, up: list(rng) if up else list(rng)[::-1]
    )(range(max(0, s - 7), min(s, 7) + 1), s % 2 == 1)
]


def _dct_matrix():
    """Orthonormal 8×8 DCT-II operator A with A[u,x] = c(u)/2·cos((2x+1)uπ/16)
    (c(0)=1/√2): FDCT = A·b·Aᵀ, IDCT = Aᵀ·K·A (A·Aᵀ = I)."""
    import math

    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = cu / 2.0 * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return a


_DCT_A = _dct_matrix()

#: standard Huffman tables (T.81 Annex K.3) — used by the ENCODER; the
#: decoder always reads tables from the file's DHT segments
_STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_STD_DC_VALS = list(range(12))
_STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_STD_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_decode_table(bits, vals):
    """Canonical Huffman → {(code_length, code): symbol} (T.81 C.2)."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_encode_table(bits, vals):
    """Canonical Huffman → {symbol: (code_length, code)}."""
    return {sym: (ln, code) for (ln, code), sym in _huff_decode_table(bits, vals).items()}


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    de-stuffing; stops (raises StopIteration) at any real marker so the MCU
    loop can handle RSTn / EOI."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.p >= len(self.d):
                raise StopIteration
            byte = self.d[self.p]
            if byte == 0xFF:
                if self.p + 1 < len(self.d) and self.d[self.p + 1] == 0x00:
                    self.p += 2  # stuffed 0xFF data byte
                else:
                    raise StopIteration  # a real marker
            else:
                self.p += 1
            self.acc = byte
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.n = 0

    def decode(self, table) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: an s-bit magnitude to its signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_pixels(data: bytes):
    """Baseline JPEG → (width, height, luminance rows) or None. See the
    section comment above for supported/unsupported features. Corrupt or
    truncated headers return None (quarantine semantics), never raise."""
    try:
        return _jpeg_pixels_inner(data)
    except (IndexError, KeyError, ValueError, StopIteration):
        return None


def _jpeg_pixels_inner(data: bytes):
    import struct

    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None  # (w, h, [(cid, h, v, tq)])
    dri = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        pos += 2
        if marker == 0xFF:  # T.81 allows any run of 0xFF fill bytes
            pos -= 1
            continue
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before any scan
            return None
        if pos + 2 > len(data):
            return None
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    vals = list(seg[i : i + 64])
                    i += 64
                elif pq == 1:
                    vals = [
                        (seg[i + 2 * j] << 8) | seg[i + 2 * j + 1] for j in range(64)
                    ]
                    i += 128
                else:
                    return None
                t = np.zeros((8, 8))
                for k, (r, c) in enumerate(_ZIGZAG):
                    t[r, c] = vals[k]
                qt[tq] = t
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential Huffman
            precision, h, w, ncomp = seg[0], (seg[1] << 8) | seg[2], (seg[3] << 8) | seg[4], seg[5]
            if precision != 8 or w == 0 or h == 0:
                return None
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / lossless / arithmetic: not baseline
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _huff_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            dri = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:  # SOS — single interleaved scan supported
            if frame is None:
                return None
            w, h, comps = frame
            ns = seg[0]
            if ns != len(comps):
                return None  # multi-scan (non-interleaved) not supported
            scan = {}
            for c in range(ns):
                scan[seg[1 + 2 * c]] = (seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15)
            return _jpeg_decode_scan(data, pos + ln, frame, qt, huff, scan, dri)
        pos += ln
    return None


def _jpeg_decode_scan(data, pos, frame, qt, huff, scan, dri):
    import math

    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = math.ceil(w / (8 * hmax))
    mcus_y = math.ceil(h / (8 * vmax))
    y_cid, y_h, y_v, y_tq = comps[0]  # first frame component is luma (Y)
    if y_tq not in qt:
        return None
    yq = qt[y_tq]
    td, ta = scan.get(y_cid, (None, None))
    if (0, td) not in huff or (1, ta) not in huff:
        return None
    yplane = np.zeros((mcus_y * y_v * 8, mcus_x * y_h * 8))
    reader = _JpegBitReader(data, pos)
    preds = {cid: 0 for cid, *_ in comps}
    mcu = 0
    try:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if dri and mcu and mcu % dri == 0:
                    # restart: byte-align, consume RSTn, reset DC predictors
                    reader.align()
                    if (
                        reader.p + 1 < len(data)
                        and data[reader.p] == 0xFF
                        and 0xD0 <= data[reader.p + 1] <= 0xD7
                    ):
                        reader.p += 2
                    preds = {cid: 0 for cid, *_ in comps}
                for cid, ch, cv, ctq in comps:
                    ctd, cta = scan[cid]
                    dc_t, ac_t = huff[(0, ctd)], huff[(1, cta)]
                    for by in range(cv):
                        for bx in range(ch):
                            coefs = np.zeros((8, 8))
                            s = reader.decode(dc_t)
                            preds[cid] += _extend(reader.bits(s), s)
                            coefs[0, 0] = preds[cid]
                            k = 1
                            while k < 64:
                                sym = reader.decode(ac_t)
                                run, size = sym >> 4, sym & 15
                                if size == 0:
                                    if run == 15:  # ZRL: 16 zeros
                                        k += 16
                                        continue
                                    break  # EOB
                                k += run
                                if k > 63:
                                    return None
                                coefs[_ZIGZAG[k]] = _extend(
                                    reader.bits(size), size
                                )
                                k += 1
                            if cid == y_cid:
                                block = _DCT_A.T @ (coefs * yq) @ _DCT_A + 128.0
                                y0, x0 = (my * cv + by) * 8, (mx * ch + bx) * 8
                                yplane[y0 : y0 + 8, x0 : x0 + 8] = block
                mcu += 1
    except (StopIteration, ValueError, IndexError):
        return None  # truncated / corrupt entropy data
    np.clip(yplane, 0.0, 255.0, out=yplane)
    if y_h != hmax or y_v != vmax:  # subsampled luma: nearest upsample
        yplane = np.repeat(
            np.repeat(yplane, vmax // y_v, axis=0), hmax // y_h, axis=1
        )
    return w, h, yplane[:h, :w].tolist()


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF byte stuffing and 1-fill padding."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _encode_block(writer, qcoefs, pred, dc_table, ac_table) -> int:
    """Huffman-encode one quantized 8×8 coefficient block (T.81 F.1.2);
    returns the new DC predictor."""
    dc = int(qcoefs[0, 0])
    diff = dc - pred
    mag = abs(diff)
    s = mag.bit_length()
    ln, code = dc_table[s]
    writer.write(code, ln)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    ac = [int(qcoefs[rc]) for rc in _ZIGZAG]
    for k in range(63, 0, -1):
        if ac[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = ac[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_table[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        ln, code = ac_table[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_table[0x00]  # EOB
        writer.write(code, ln)
    return dc


def encode_gray_jpeg(
    pixels: np.ndarray, quant: np.ndarray | None = None
) -> bytes:
    """REAL baseline JPEG encoder for an 8-bit grayscale image (any size;
    edges replicate-padded to 8) with the standard Annex-K Huffman tables —
    the testable inverse of the JPEG branch of :func:`decode_image_stdlib`,
    exactly as :func:`encode_text_png` is for the PNG branch. ``quant``
    defaults to all-ones (near-lossless: roundtrip error is FDCT/IDCT
    rounding only)."""
    import struct

    q = np.ones((8, 8)) if quant is None else np.asarray(quant, dtype=float)
    h, w = pixels.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(
        np.asarray(pixels, dtype=float), ((0, ph - h), (0, pw - w)), mode="edge"
    )
    dc_enc = _huff_encode_table(_STD_DC_BITS, _STD_DC_VALS)
    ac_enc = _huff_encode_table(_STD_AC_BITS, _STD_AC_VALS)
    writer = _JpegBitWriter()
    pred = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            qcoefs = np.round((_DCT_A @ block @ _DCT_A.T) / q)
            pred = _encode_block(writer, qcoefs, pred, dc_enc, ac_enc)
    zz_q = bytes(int(q[rc]) for rc in _ZIGZAG)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q  # DQT
    out += (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 11, 8, h, w, 1)
        + b"\x01\x11\x00"  # comp 1, 1×1 sampling, quant table 0
    )  # SOF0
    for tc, bits, vals in ((0, _STD_DC_BITS, _STD_DC_VALS), (0x10, _STD_AC_BITS, _STD_AC_VALS)):
        out += (
            b"\xff\xc4"
            + struct.pack(">H", 3 + 16 + len(vals))
            + bytes([tc])
            + bytes(bits)
            + bytes(vals)
        )  # DHT
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"  # SOS
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _quadrant_features(w: int, h: int, lum_rows) -> list[float]:
    """4-float luminance-quadrant feature [TL, TR, BL, BR]: mean luminance
    (normalized to [0,1]) over each half-split quadrant; odd dimensions share
    the middle row/column between halves (never an empty quadrant)."""
    ys = [(0, (h + 1) // 2), (h // 2, h)]
    xs = [(0, (w + 1) // 2), (w // 2, w)]
    feats = []
    for y0, y1 in ys:
        for x0, x1 in xs:
            total = sum(
                lum_rows[y][x] for y in range(y0, y1) for x in range(x0, x1)
            )
            feats.append(total / ((y1 - y0) * (x1 - x0)) / 255.0)
    return feats


def decode_image_stdlib(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL image decode without Pillow — PNG (zlib inflate + unfilter),
    baseline JPEG (Huffman entropy decode + numpy IDCT, r6), 24-bit BMP,
    and P6 PPM — so the real-decoder path is CI-provable in containers
    without Pillow (VERDICT r4 item 5; JPEG per VERDICT r5 item 2).
    Identical mapInPandas batch shape / schema / failure semantics to
    :func:`decode_image_pil`: unparseable payloads keep their metadata and
    yield NULL features/dims. Feature = the same 2×2 luminance-quadrant
    means (exact box means here; Pillow's resize kernel may differ in the
    low digits — dims/hash/n_bytes are identical across paths)."""
    df, _ = _mid_input(df, id_col, "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, hashes, feats, widths, heights = [], [], [], [], []
            for payload in pdf[_MVAL]:
                data = bytes(payload)
                n_bytes.append(len(data))
                hashes.append(hashlib.md5(data).hexdigest())
                decoded = None
                try:
                    decoded = (
                        _png_pixels(data)
                        or _jpeg_pixels(data)
                        or _bmp_pixels(data)
                        or _ppm_pixels(data)
                    )
                except Exception:  # noqa: BLE001 — corrupt payload = data
                    decoded = None
                if decoded is None:
                    feats.append(None)
                    widths.append(None)
                    heights.append(None)
                else:
                    w, h, lum = decoded
                    feats.append(_quadrant_features(w, h, lum))
                    widths.append(w)
                    heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[_MID],
                    "n_bytes": pd.array(n_bytes, dtype="int32"),
                    "content_hash": hashes,
                    "features": feats,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                }
            )

    return df.mapInPandas(run, schema=DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# Audio: real RIFF/WAVE PCM decode (the audio sibling of the image decoders —
# multimodal training corpora carry waveform columns, and PCM WAV is the
# interchange format every resampler/feature extractor starts from)
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = (
    "doc_id long, n_bytes int, content_hash string, sample_rate int, "
    "n_channels int, n_samples int, features array<float>"
)


def _wav_samples(data: bytes):
    """Minimal stdlib WAV decoder: RIFF chunk walk, PCM 8-bit (unsigned) or
    16-bit (signed LE), any channel count (channels average to mono).
    Returns (sample_rate, n_channels, mono samples in [-1, 1]) or None
    (never raises — shared quarantine contract)."""
    try:
        return _wav_samples_inner(data)
    except (IndexError, ValueError, OverflowError):
        return None


def _wav_samples_inner(data: bytes):
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
        pos += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned
    if fmt is None or raw is None or len(fmt) < 16:
        return None
    audio_fmt, nch, rate, _byte_rate, _align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if audio_fmt != 1 or nch == 0 or rate == 0 or bits not in (8, 16):
        return None  # non-PCM (float/ADPCM/extensible) → quarantine
    width = bits // 8
    frame = width * nch
    n = len(raw) // frame
    # Vectorized decode (VERDICT r7 item 1): np.frombuffer per-channel
    # columns with SEQUENTIAL channel accumulation (c0 + c1 + ... then
    # / nch), so float addition order — and therefore every output bit —
    # matches the per-sample scalar decoder this replaced. Bit-identity is
    # pinned by tests/test_audio.py::
    # test_vectorized_decoder_bit_identical_to_scalar_reference, whose
    # _scalar_wav_reference preserves the replaced loop verbatim as the
    # reference. Samples return as a float64 ndarray (r9, VERDICT r8 item
    # 6): the old list contract's .tolist() was one O(n) Python-object
    # materialization per clip that downstream _pcm_int16 immediately
    # re-vectorized away — every element is still the same IEEE double.
    if bits == 16:
        arr = np.frombuffer(raw[: n * frame], dtype="<i2").reshape(n, nch)
        chans = arr.astype(np.float64) / 32768.0
    else:
        arr = np.frombuffer(raw[: n * frame], dtype=np.uint8).reshape(n, nch)
        chans = (arr.astype(np.float64) - 128.0) / 128.0
    acc = np.zeros(n, dtype=np.float64)
    for c in range(nch):  # sequential channel order = scalar bit order
        acc += chans[:, c]
    return rate, nch, acc / nch


def _segment_features(samples, n_seg: int = 4) -> list[float]:
    """Mean ABSOLUTE amplitude per equal time segment (the audio analog of
    the luminance-quadrant means): deterministic integer-friendly math, so
    encoder-derived payloads carry SQL oracles. Empty segments read 0.

    Vectorized (r9, with the ndarray decode contract) but bit-identical to
    the scalar ``sum(abs(s) for s in samples[lo:hi]) / (hi - lo)`` it
    replaces: ``cumsum`` is DEFINED as sequential accumulation
    (``r[i] = r[i-1] + a[i]``), so its final partial sum adds the same
    doubles in the same order as the old per-element loop — unlike
    ``np.sum``, whose pairwise reduction rounds differently."""
    a = np.abs(np.asarray(samples, dtype=np.float64))
    n = a.size
    feats = []
    for i in range(n_seg):
        lo, hi = i * n // n_seg, (i + 1) * n // n_seg
        feats.append(
            float(np.cumsum(a[lo:hi])[-1]) / (hi - lo) if hi > lo else 0.0
        )
    return feats


def decode_audio_stdlib(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL audio decode with the standard library only: RIFF/WAVE PCM →
    (sample_rate, n_channels, n_samples, 4 segment mean-amplitude
    features). Same Arrow-batched mapInPandas shape and quarantine failure
    semantics as the image decoders; a real resample/fbank extractor slots
    into the same batch loop."""
    df, _ = _mid_input(df, id_col, "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, hashes = [], []
            rates, chans, counts, feats = [], [], [], []
            for payload in pdf[_MVAL]:
                data = bytes(payload)
                n_bytes.append(len(data))
                hashes.append(hashlib.md5(data).hexdigest())
                try:
                    decoded = _wav_samples(data)
                except Exception:  # noqa: BLE001 — corrupt payload = data
                    decoded = None
                if decoded is None:
                    rates.append(None)
                    chans.append(None)
                    counts.append(None)
                    feats.append(None)
                else:
                    rate, nch, samples = decoded
                    rates.append(rate)
                    chans.append(nch)
                    counts.append(len(samples))
                    feats.append(_segment_features(samples))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[_MID],
                    "n_bytes": pd.array(n_bytes, dtype="int32"),
                    "content_hash": hashes,
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_channels": pd.array(chans, dtype="Int32"),
                    "n_samples": pd.array(counts, dtype="Int32"),
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=AUDIO_SCHEMA)


def encode_wav_pcm16(
    samples, sample_rate: int = 16_000, n_channels: int = 1
) -> bytes:
    """REAL PCM16 WAV encoder (mono interleave passthrough): the testable
    inverse of :func:`_wav_samples`. ``samples`` are int16 values (for
    stereo, interleaved frames)."""
    import struct

    raw = b"".join(
        struct.pack("<h", max(-32768, min(32767, int(s)))) for s in samples
    )
    byte_rate = sample_rate * n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, n_channels * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(raw))
        + raw
    )


def encode_text_wav(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL-WAV generator (the audio sibling of
    :func:`encode_text_png` / :func:`encode_text_jpeg`): each doc becomes a
    genuine 16-sample mono PCM16 WAV at 16 kHz whose four 4-sample segments
    hold amplitude ``md5_byte · 128`` with alternating sign (so the decoder
    must take magnitudes). The segment mean-abs feature is then exactly
    ``byte/256`` — a binary fraction, exact in float — giving the
    encode→decode roundtrip a full value-hash oracle (catalog
    ``multimodal_decode_wav``)."""
    df, id_type = _mid_input(df, id_col, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[_MVAL]:
                b = hashlib.md5(str(text).encode()).digest()[:4]
                samples = []
                for seg in range(4):
                    for j in range(4):
                        samples.append(b[seg] * 128 * (1 if j % 2 == 0 else -1))
                payloads.append(encode_wav_pcm16(samples))
            yield pd.DataFrame({_MID: pdf[_MID], "payload": payloads})

    return df.mapInPandas(
        run, schema=f"{_MID} {id_type}, payload binary"
    ).withColumnRenamed(_MID, id_col)


def decode(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode dispatch — always a REAL decoder: Pillow (C speed, every
    format) when the optional dependency is present, else the stdlib
    PNG/BMP/PPM decoder. Same schema and failure semantics either way;
    :func:`decode_stub` remains available for plumbing-only benches."""
    if pil_available():
        return decode_image_pil(df, id_col)
    return decode_image_stdlib(df, id_col)


def encode_text_png(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL-PNG generator (the testable inverse of
    :func:`decode_image_stdlib`): each doc becomes a genuine 2×2 8-bit
    greyscale PNG — zlib-deflated IDAT, correct CRCs — whose four pixels
    are the first four md5 bytes of the text, with the second row's filter
    cycling None/Sub/Up by doc id so decoding exercises the unfilter paths
    on production-sized data. Because the pixel values are md5-derivable in
    SQL, the encode→decode roundtrip carries a full value-hash oracle
    (catalog ``multimodal_decode_png``) — the real decoder is
    correctness-gated by the driver, not just unit tests."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
    iend = chunk(b"IEND", b"")

    df, id_type = _mid_input(df, id_col, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf[_MID], pdf[_MVAL]):
                b = hashlib.md5(str(text).encode()).digest()[:4]
                row0 = b"\x00" + bytes(b[:2])
                f1 = int(doc_id) % 3
                if f1 == 0:  # None
                    row1 = b"\x00" + bytes(b[2:4])
                elif f1 == 1:  # Sub (left-neighbor diff)
                    row1 = b"\x01" + bytes([b[2], (b[3] - b[2]) % 256])
                else:  # Up (previous-row diff)
                    row1 = b"\x02" + bytes(
                        [(b[2] - b[0]) % 256, (b[3] - b[1]) % 256]
                    )
                payloads.append(
                    b"\x89PNG\r\n\x1a\n"
                    + ihdr
                    + chunk(b"IDAT", zlib.compress(row0 + row1))
                    + iend
                )
            yield pd.DataFrame({_MID: pdf[_MID], "payload": payloads})

    return df.mapInPandas(
        run, schema=f"{_MID} {id_type}, payload binary"
    ).withColumnRenamed(_MID, id_col)


def encode_text_jpeg(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL-JPEG generator (the JPEG sibling of
    :func:`encode_text_png`): each doc becomes a genuine 16×16 baseline
    grayscale JPEG — four 8×8 blocks, standard Annex-K Huffman tables, DC
    quant 8 — whose block values are the first four md5 bytes of the text.
    With a constant block the FDCT has DC = 8·(v−128) and zero AC, so
    quantizing by 8 stores exactly v−128 and the decode roundtrip returns v
    bit-exactly: the entropy decode (DC prediction chain across 4 blocks),
    dequant, and IDCT are all value-hash-oracled by the driver (catalog
    ``multimodal_decode_jpeg``), not just unit tests."""

    quant = np.full((8, 8), 8.0)
    df, id_type = _mid_input(df, id_col, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[_MVAL]:
                b = hashlib.md5(str(text).encode()).digest()[:4]
                img = np.zeros((16, 16))
                img[:8, :8] = b[0]
                img[:8, 8:] = b[1]
                img[8:, :8] = b[2]
                img[8:, 8:] = b[3]
                payloads.append(encode_gray_jpeg(img, quant))
            yield pd.DataFrame({_MID: pdf[_MID], "payload": payloads})

    return df.mapInPandas(
        run, schema=f"{_MID} {id_type}, payload binary"
    ).withColumnRenamed(_MID, id_col)


def _fake_features(data: bytes, n: int = 4) -> list[float]:
    """Deterministic stand-in for a real decoder: n floats from the content
    digest. NOT a real embedding — plumbing-only."""
    h = hashlib.sha256(data).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(n)]


def decode_stub(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode pipeline over binary payloads (mapInPandas).

    Real decode (image resize / audio resample / frame sampling) would replace
    the body; the batch shape (pandas DataFrame of bytes in, typed records
    out) and partitioning behavior are exactly what a production decoder
    needs. Raises nothing here — a real implementation should classify decode
    failures as user-data errors (errors.RemoteTaskFailedDataError).
    """
    df, _ = _mid_input(df, id_col, "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[_MVAL]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[_MID],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "content_hash": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "features": payloads.map(lambda b: _fake_features(bytes(b))),
                    # fake dimensions a real image decoder would emit
                    "width": payloads.map(lambda b: 1 + len(b) % 1024).astype("int32"),
                    "height": payloads.map(lambda b: 1 + len(b) % 768).astype("int32"),
                }
            )

    return df.mapInPandas(run, schema=DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# Video: real MJPEG-in-AVI decode — the RIFF chunk walk (shared with WAV)
# plus the baseline JPEG decoder make a genuine video path with no new
# codec: AVI 'movi' frames ARE JPEGs. This replaces the frame-sample stub
# as the decoded-video story; production swaps in ffmpeg for H.264+ with
# the same mapInPandas batch shape.
# ---------------------------------------------------------------------------

FRAMES_REAL_SCHEMA = (
    "doc_id long, n_frames int, frame_idx int, width int, height int, "
    "features array<float>"
)


def _avi_mjpeg_frames(data: bytes):
    """Minimal stdlib AVI (RIFF) demuxer: recursive LIST walk collecting
    video frame chunks (``..dc``/``..db``) whose payload is a JPEG.
    Returns the list of JPEG payloads or None (never raises)."""
    import struct

    def walk(buf: bytes, out: list) -> None:
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            (sz,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + sz]
            if cid == b"LIST" and len(body) >= 4:
                walk(body[4:], out)  # skip the list type fourcc
            elif cid[2:4] in (b"dc", b"db") and body.startswith(b"\xff\xd8"):
                out.append(body)
            pos += 8 + sz + (sz & 1)  # chunks are word-aligned

    try:
        if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
            return None
        frames: list = []
        walk(data[12:], frames)
        return frames or None
    except (IndexError, ValueError):
        return None


def decode_video_stdlib(
    df: DataFrame, id_col: str = "doc_id", stride: int = 1
) -> DataFrame:
    """REAL video decode: demux MJPEG frames from an AVI container and run
    the baseline JPEG decoder on every ``stride``-th frame — one output row
    per sampled frame carrying its dims and luminance-quadrant features
    (rows-out != rows-in through mapInPandas, the real shape of the old
    stub). Non-AVI / frameless / corrupt payloads quarantine to a single
    NULL-frame row so provenance survives."""
    df, _ = _mid_input(df, id_col, "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_fr, idxs, ws, hs, feats = [], [], [], [], [], []
            for doc_id, payload in zip(pdf[_MID], pdf[_MVAL]):
                frames = _avi_mjpeg_frames(bytes(payload))
                if frames is None:
                    ids.append(doc_id)
                    n_fr.append(None)
                    idxs.append(None)
                    ws.append(None)
                    hs.append(None)
                    feats.append(None)
                    continue
                for i in range(0, len(frames), stride):
                    decoded = _jpeg_pixels(frames[i])
                    ids.append(doc_id)
                    n_fr.append(len(frames))
                    idxs.append(i)
                    if decoded is None:
                        ws.append(None)
                        hs.append(None)
                        feats.append(None)
                    else:
                        w, h, lum = decoded
                        ws.append(w)
                        hs.append(h)
                        feats.append(_quadrant_features(w, h, lum))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_frames": pd.array(n_fr, dtype="Int32"),
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=FRAMES_REAL_SCHEMA)


def encode_mjpeg_avi(
    frames: list, width: int = 16, height: int = 16, fps: int = 10
) -> bytes:
    """REAL MJPEG AVI encoder (the testable inverse of
    :func:`_avi_mjpeg_frames`): correct RIFF/hdrl/strl/movi structure with
    an MJPG vids stream; ``frames`` are JPEG payload bytes."""
    import struct

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX off, AVIF_WASCAPTUREFILE off (0x10=HASINDEX? keep simple)
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_text_avi(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL-AVI generator (the video sibling of
    :func:`encode_text_jpeg`): each doc becomes a genuine 4-frame MJPEG AVI
    whose frame ``i`` is the 16×16 quadrant JPEG built from md5 bytes
    ``4i..4i+3`` of the text (all 16 md5 bytes used across the clip), so
    the demux→decode roundtrip carries a full value-hash oracle (catalog
    ``multimodal_decode_video``)."""
    quant = np.full((8, 8), 8.0)
    df, id_type = _mid_input(df, id_col, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[_MVAL]:
                b = hashlib.md5(str(text).encode()).digest()
                frames = []
                for i in range(4):
                    img = np.zeros((16, 16))
                    img[:8, :8] = b[4 * i]
                    img[:8, 8:] = b[4 * i + 1]
                    img[8:, :8] = b[4 * i + 2]
                    img[8:, 8:] = b[4 * i + 3]
                    frames.append(encode_gray_jpeg(img, quant))
                payloads.append(encode_mjpeg_avi(frames))
            yield pd.DataFrame({_MID: pdf[_MID], "payload": payloads})

    return df.mapInPandas(
        run, schema=f"{_MID} {id_type}, payload binary"
    ).withColumnRenamed(_MID, id_col)


RESIZE_REAL_SCHEMA = (
    "doc_id long, width int, height int, out_width int, out_height int, "
    "pixels array<float>"
)


def resize_image_stdlib(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL image resize on the stdlib decode path (r6 — replaces the
    integer-math stub as the decoded-pixel story): payload → stdlib decode
    (PNG/JPEG/BMP/PPM luminance) → AREA-AVERAGE (box) downscale to
    ``out_w × out_h`` via exact partial-pixel-weighted means — the
    anti-aliasing-correct kernel for thumbnails/vision-model preprocessing,
    and exact integer math when the ratio divides evenly (so
    encoder-derived payloads carry full value-hash oracles). Output rows
    keep the source dims plus the resized pixel grid (row-major, [0,1]).
    Unparseable payloads quarantine to NULL dims/pixels as everywhere."""

    def box_resize(arr: np.ndarray, ow: int, oh: int) -> np.ndarray:
        h, w = arr.shape
        # exact area-average via cumulative sums: output cell (i,j) is the
        # mean over the source rectangle [i·h/oh, (i+1)·h/oh) × [...]
        out = np.zeros((oh, ow))
        csum = np.zeros((h + 1, w + 1))
        csum[1:, 1:] = np.cumsum(np.cumsum(arr, axis=0), axis=1)

        def span(i, n, m):  # fractional source span of output index i
            return i * m / n, (i + 1) * m / n

        def integral(y0, y1, x0, x1):
            # exact integral of the piecewise-constant image over a
            # fractional rectangle: split into whole cells + edge strips
            import math

            val = 0.0
            ya, yb = math.floor(y0), math.ceil(y1)
            for yy in range(ya, yb):
                fy = min(y1, yy + 1) - max(y0, yy)
                xa, xb = math.floor(x0), math.ceil(x1)
                for xx in range(xa, xb):
                    fx = min(x1, xx + 1) - max(x0, xx)
                    val += arr[yy, xx] * fy * fx
            return val

        exact = h % oh == 0 and w % ow == 0
        for i in range(oh):
            y0, y1 = span(i, oh, h)
            for j in range(ow):
                x0, x1 = span(j, ow, w)
                if exact:
                    iy0, iy1, ix0, ix1 = int(y0), int(y1), int(x0), int(x1)
                    s = (
                        csum[iy1, ix1]
                        - csum[iy0, ix1]
                        - csum[iy1, ix0]
                        + csum[iy0, ix0]
                    )
                    out[i, j] = s / ((iy1 - iy0) * (ix1 - ix0))
                else:
                    out[i, j] = integral(y0, y1, x0, x1) / (
                        (y1 - y0) * (x1 - x0)
                    )
        return out

    df, _ = _mid_input(df, id_col, "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, pixels = [], [], [], []
            for doc_id, payload in zip(pdf[_MID], pdf[_MVAL]):
                data = bytes(payload)
                ids.append(doc_id)
                decoded = (
                    _png_pixels(data)
                    or _jpeg_pixels(data)
                    or _bmp_pixels(data)
                    or _ppm_pixels(data)
                )
                if decoded is None:
                    ws.append(None)
                    hs.append(None)
                    pixels.append(None)
                else:
                    w, h, lum = decoded
                    ws.append(w)
                    hs.append(h)
                    arr = box_resize(np.asarray(lum, dtype=float), out_w, out_h)
                    pixels.append([float(v) / 255.0 for v in arr.reshape(-1)])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "out_width": pd.array(
                        [out_w if w is not None else None for w in ws],
                        dtype="Int32",
                    ),
                    "out_height": pd.array(
                        [out_h if h is not None else None for h in hs],
                        dtype="Int32",
                    ),
                    "pixels": pixels,
                }
            )

    return df.mapInPandas(run, schema=RESIZE_REAL_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, out_width int, out_height int"
FRAMES_SCHEMA = "doc_id long, n_frames int, frame_idx int, frame_hash string"


def resize_stub(df: DataFrame, id_col: str = "doc_id", target: int = 256) -> DataFrame:
    """Image-resize plumbing (mapInPandas over binary payloads).

    Output dimensions use pure integer math (aspect-preserving fit into
    ``target``) so the stub is oracle-portable; a real decoder (PIL) replaces
    the body, keeping the same batch shape and output schema.
    """
    df, _ = _mid_input(df, id_col, "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = pdf[_MVAL].map(len)
            w = (1 + lens % 1024).astype("int64")
            h = (1 + lens % 768).astype("int64")
            m = np.maximum(w, h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[_MID],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "out_width": (w * target // m).astype("int32"),
                    "out_height": (h * target // m).astype("int32"),
                }
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


def frame_sample_stub(
    df: DataFrame, id_col: str = "doc_id", stride: int = 24
) -> DataFrame:
    """Video frame-sampling plumbing: one input row (binary payload) fans out
    to one output row per sampled frame — the mapInPandas batch shape a real
    ffmpeg-style sampler needs (rows-out != rows-in). Frame count and frame
    hashes are deterministic fakes from the payload bytes."""
    df, _ = _mid_input(df, id_col, "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_n, out_idx, out_hash = [], [], [], []
            for doc_id, payload in zip(pdf[_MID], pdf[_MVAL]):
                data = bytes(payload)
                n_frames = 1 + len(data) % 240
                content = hashlib.md5(data).hexdigest()
                for idx in range(0, n_frames, stride):
                    out_ids.append(doc_id)
                    out_n.append(n_frames)
                    out_idx.append(idx)
                    out_hash.append(
                        hashlib.md5(f"{content}|{idx}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": out_ids,
                    "n_frames": pd.array(out_n, dtype="int32"),
                    "frame_idx": pd.array(out_idx, dtype="int32"),
                    "frame_hash": out_hash,
                }
            )

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)
