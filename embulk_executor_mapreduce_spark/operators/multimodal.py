"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata.

The Spark-side machinery is real — BinaryType columns, metadata structs,
Arrow-batched ``mapInPandas`` decode pipelines with correct schemas and batch
shapes. Media decoding dispatches on OPTIONAL dependencies: when Pillow is
importable, :func:`decode` runs the real image decoder
(:func:`decode_image_pil`); otherwise it falls back to the deterministic
stub so the plumbing stays testable end-to-end in minimal containers
(pytest skip-markers gate the real-path tests). Frame sampling likewise
probes for an ffmpeg binary (:func:`ffmpeg_available`).

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


def to_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Binary ingestion surface: typed binary payload + metadata struct.
    (Real pipelines land here via ``spark.read.format('binaryFile')``.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            n_bytes, hashes, feats, widths, heights = [], [], [], [], []
            for payload in pdf["payload"]:
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
                    "doc_id": pdf[id_col],
                    "n_bytes": pd.array(n_bytes, dtype="int32"),
                    "content_hash": hashes,
                    "features": feats,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                }
            )

    return df.mapInPandas(run, schema=DECODE_SCHEMA)


def decode(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode dispatch: the real Pillow decoder when the optional dependency
    is present, the deterministic stub otherwise — callers get the same
    schema either way and the suite stays green in minimal containers."""
    if pil_available():
        return decode_image_pil(df, id_col)
    return decode_stub(df, id_col)


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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
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


RESIZE_SCHEMA = "doc_id long, width int, height int, out_width int, out_height int"
FRAMES_SCHEMA = "doc_id long, n_frames int, frame_idx int, frame_hash string"


def resize_stub(df: DataFrame, id_col: str = "doc_id", target: int = 256) -> DataFrame:
    """Image-resize plumbing (mapInPandas over binary payloads).

    Output dimensions use pure integer math (aspect-preserving fit into
    ``target``) so the stub is oracle-portable; a real decoder (PIL) replaces
    the body, keeping the same batch shape and output schema.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = pdf["payload"].map(len)
            w = (1 + lens % 1024).astype("int64")
            h = (1 + lens % 768).astype("int64")
            m = np.maximum(w, h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_n, out_idx, out_hash = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
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
