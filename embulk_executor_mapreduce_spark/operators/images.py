"""Perceptual image hashing + Hamming-banded near-dup (r15, VERDICT r14
item 1) — the image-level dedup family text already has four of
(exact / MinHash / SimHash / semantic): re-encoded, re-scaled, or
brightness-shifted duplicates of one image pass byte-hash ``dedup_exact``
untouched, so an image-text corpus needs a hash of the DECODED PIXELS.

Two standard perceptual hashes over the engine's own real decode
(``multimodal._png_pixels`` / ``_jpeg_pixels`` / BMP / PPM) and exact
area-average resize:

* **dHash** (difference hash — gradient sign grid, the Krawetz
  construction): box-resize luminance to 9×8, bit(r, c) = P[r][c] <
  P[r][c+1] — 64 bits of local gradient ORDER, invariant to any strictly
  monotone brightness map and to integer rescaling. Integer comparisons
  end-to-end ⇒ a full value-hash SQL oracle when payloads are
  encoder-derived (the ``image_dhash_neardup`` catalog row).
* **pHash** (DCT hash, pHash.org construction): box-resize to 32×32,
  2-D DCT-II, keep the top-left 8×8 low-frequency block, DROP the DC
  coefficient (so global brightness shifts cannot move the median), bit
  = coefficient > median of the remaining 63. Float DCT ⇒ pytest-pinned
  (invariance + discrimination), not SQL-replayable.

Candidate pairing is the SAME Hamming-banding discipline as
``dedup.simhash64``'s LSH (reference near-dup semantics:
embulk-executor-mapreduce has no image ops; the banding mirrors
``minhash_candidates``): split the 64-bit hash into ``bands`` contiguous
16-bit keys — two images within Hamming distance d share at least one
band whenever d < bands (pigeonhole), and random non-dups (expected
distance ~32) almost never collide on a full 16-bit band. Candidates are
verified by EXACT Hamming distance (``bit_count(a XOR b)``), so banding
only ever adds recall, never false positives.

Scale shape: hashing is one Arrow-batched ``mapInPandas`` pass (decode +
resize + hash per image, numpy box-filter — the multimodal discipline);
banding is an explode to n_imgs × bands rows; the self-equi-join runs on
(band, band_key) — never all-pairs. A constant-image corpus (all-zero
gradients) degenerates every band key to one bucket, the same skew
caveat as MinHash banding — salt or pre-split such corpora.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .multimodal import (
    _bmp_pixels,
    _jpeg_pixels,
    _mid_input,
    _png_pixels,
    _ppm_pixels,
)

_MID = "__mm_id"
_MVAL = "__mm_val"
_MIN_LONG = -(1 << 63)

#: dHash grid: 9 columns × 8 rows of luminance means → 64 horizontal
#: gradient-sign bits (bit index = r*8 + c, MSB-first in the packed long).
#: Output schema is `(id AT ITS INPUT TYPE, width int, height int, hash
#: long)` — built per call from _mid_input's id DDL type.
DHASH_W, DHASH_H = 9, 8


def _decode_any(data: bytes):
    """(width, height, luminance rows) via the stdlib decoders, or None —
    the shared never-raise quarantine contract."""
    try:
        return (
            _png_pixels(data)
            or _jpeg_pixels(data)
            or _bmp_pixels(data)
            or _ppm_pixels(data)
        )
    except Exception:  # noqa: BLE001 — corrupt payload = data, not a crash
        return None


def _box_resize(arr: np.ndarray, ow: int, oh: int) -> np.ndarray:
    """Area-average (box) resample to ``oh × ow`` via per-axis
    fractional-coverage weight matrices: out = Wy · arr · Wxᵀ with each
    weight the overlap length of output cell i's span [i·m/n, (i+1)·m/n)
    with source cell j — the same kernel as
    ``multimodal.resize_image_stdlib`` in vectorized form.

    Precision contract (what the dHash fixture oracle actually rests on;
    r15 property-test finding): at power-of-two ratios the means are
    BIT-exact (halving is exact in binary); at other even ratios (1/3
    weights …) they carry ≤ ~1e-13 residue — but dHash needs only ORDER,
    and that survives exactly: two constant blocks holding the SAME
    integer produce bit-identical means (identical operand sequence
    through the two matmuls), while DISTINCT integers differ by ≥ 1,
    twelve orders of magnitude above the residue. So strict ``<`` on the
    resized means equals strict ``<`` on the grid integers at any even
    ratio — the closed-form oracle is sound without bit-exact means."""
    return _box_weights(oh, arr.shape[0]) @ arr @ _box_weights(ow, arr.shape[1]).T


#: cache only matrices up to this many float64 cells (0.5 MB each): the
#: 256-slot LRU is then bounded at ~128 MB per Python worker in the worst
#: case instead of growing with the corpus's largest image dimension
_BOX_WEIGHTS_CACHE_MAX_CELLS = 65_536


def _box_weights(n_out: int, n_in: int) -> np.ndarray:
    """The per-axis fractional-coverage weight matrix of
    :func:`_box_resize`, cached by shape (r16 optimization, guide §4.2 —
    per-task work): the matrix depends only on (n_out, n_in), yet the
    Python double loop building it dominated the per-image hash cost
    (micro-benchmark: 97 of dHash's 132 µs, 258 of pHash's 406 µs per
    18×16 fixture image was _box_resize, almost all weight construction).
    Same floats, computed once per worker per shape — bit-identity with
    the uncached form is what the pinned hash tests assert. Bounded two
    ways (r16 review finding: entry count alone lets 256 corpus-sized
    matrices pin hundreds of MB per worker): oversized shapes skip the
    cache entirely — for such images the decode dominates anyway — and
    the LRU caps the cached count."""
    if n_out * n_in > _BOX_WEIGHTS_CACHE_MAX_CELLS:
        return _box_weights_build(n_out, n_in)
    return _box_weights_cached(n_out, n_in)


@lru_cache(maxsize=256)
def _box_weights_cached(n_out: int, n_in: int) -> np.ndarray:
    return _box_weights_build(n_out, n_in)


def _box_weights_build(n_out: int, n_in: int) -> np.ndarray:
    w = np.zeros((n_out, n_in))
    for i in range(n_out):
        y0, y1 = i * n_in / n_out, (i + 1) * n_in / n_out
        j0, j1 = int(np.floor(y0)), int(np.ceil(y1))
        for j in range(j0, j1):
            w[i, j] = min(y1, j + 1) - max(y0, j)
    w = w / (n_in / n_out)
    # the cached array is shared across every later call of this shape: a
    # mutation would silently corrupt all subsequent hashes — freeze it
    w.setflags(write=False)
    return w


def _pack_bits(bits) -> int:
    """MSB-first 64-bit pack into a signed two's-complement long — the
    same sign-aware assembly as ``dedup.simhash64`` (bit 0 is the sign
    bit, added as MIN_LONG so both engines agree on the packed value)."""
    v = 0
    for idx, b in enumerate(bits):
        if b:
            v |= 1 << (63 - idx)
    return v - (1 << 64) if v >= (1 << 63) else v


def _dhash_from_lum(lum) -> int:
    grid = _box_resize(np.asarray(lum, dtype=float), DHASH_W, DHASH_H)
    bits = (grid[:, :-1] < grid[:, 1:]).reshape(-1)
    return _pack_bits(bits)


def _dct_mat(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (the JPEG transform at size n — the 8×8
    instance is ``multimodal._dct_matrix``; pHash needs the 32×32 one)."""
    a = np.zeros((n, n))
    for k in range(n):
        scale = np.sqrt(1.0 / n) if k == 0 else np.sqrt(2.0 / n)
        for x in range(n):
            a[k, x] = scale * np.cos((2 * x + 1) * k * np.pi / (2 * n))
    return a


_DCT32 = _dct_mat(32)


def _phash_from_lum(lum) -> int:
    grid = _box_resize(np.asarray(lum, dtype=float), 32, 32)
    coefs = (_DCT32 @ grid @ _DCT32.T)[:8, :8].reshape(-1)
    ac = coefs[1:]  # DROP DC: global brightness must not move the median
    med = float(np.median(ac))
    bits = np.concatenate(([False], ac > med))
    return _pack_bits(bits)


def _hash_map_in_pandas(
    df: DataFrame, id_col: str, hash_fn, hash_name: str
) -> DataFrame:
    # the id rides through at ITS OWN type (string URIs, ints, longs —
    # _mid_input hands the DDL type back for exactly this; r15 review
    # finding: a hardcoded `long` crashed string ids and silently widened
    # int ones)
    df, id_type = _mid_input(df, id_col, "payload")
    schema = f"doc_id {id_type}, width int, height int, {hash_name} long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, out = [], [], [], []
            for doc_id, payload in zip(pdf[_MID], pdf[_MVAL]):
                ids.append(doc_id)
                # NULL payloads (optional-column joins) quarantine like
                # any unparseable image — bytes(None) would raise OUTSIDE
                # _decode_any's guard (r15 review finding)
                decoded = (
                    None if payload is None else _decode_any(bytes(payload))
                )
                if decoded is None:
                    ws.append(None)
                    hs.append(None)
                    out.append(None)
                else:
                    w, h, lum = decoded
                    ws.append(w)
                    hs.append(h)
                    out.append(hash_fn(lum))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    hash_name: pd.array(out, dtype="Int64"),
                }
            )

    return df.mapInPandas(run, schema=schema).withColumnRenamed(
        "doc_id", id_col
    )


def image_dhash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-image 64-bit difference hash over REAL decoded pixels:
    ``payload`` → stdlib decode → exact 9×8 box resize → horizontal
    gradient signs, packed MSB-first. Unparseable or NULL payloads
    quarantine to NULL dims/hash (the decoder contract). One Arrow pass;
    follow the ``spread_narrow``-before-Python advice of the multimodal
    module when feeding from a narrow scan."""
    return _hash_map_in_pandas(df, id_col, _dhash_from_lum, "dhash")


def image_phash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-image 63-bit DCT perceptual hash (pHash): 32×32 box resize →
    DCT-II → top-left 8×8 low-frequency block minus DC → median
    threshold. More robust than dHash to local noise; float DCT, so it is
    pytest-pinned rather than SQL-oracled."""
    return _hash_map_in_pandas(df, id_col, _phash_from_lum, "phash")


def hamming64(a, b) -> F.Column:
    """Exact Hamming distance between two packed 64-bit hashes — the
    verification predicate after banding (both engines agree on
    ``bit_count(xor)`` over two's-complement longs, probe-pinned)."""
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))


def _banded_hashes(
    hashes: DataFrame, id_col: str, hash_col: str, bands: int
) -> DataFrame:
    """``(id, hash, band, bkey)`` band rows for a packed-64-bit hash
    frame — the ONE banding definition (pairs, incremental state, and the
    SQL oracles all split the hash into ``bands`` contiguous
    ``64/bands``-bit keys). NULL hashes (undecodable payloads) drop here,
    so they never pair and never enter an index."""
    width = 64 // bands
    mask = (1 << width) - 1
    live = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col), F.col(hash_col)
    )
    return live.select(
        id_col,
        hash_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col(hash_col), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(id_col, hash_col, "bk.band", "bk.bkey")


def image_neardup_pairs(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    bands: int = 4,
    max_hamming: int = 6,
) -> DataFrame:
    """Near-duplicate image pairs from banded perceptual hashes:
    ``(id_a, id_b, hamming)`` with id_a < id_b and exact Hamming distance
    ≤ ``max_hamming``. NULL hashes (undecodable payloads) never pair.

    Banding (the simhash64/MinHash LSH discipline): the 64-bit hash
    splits into ``bands`` contiguous keys; candidates share ≥1 full band
    — guaranteed complete for d < bands by pigeonhole, and probabilistic
    recall beyond (a missed true pair needs a flipped bit in EVERY band).
    The self-join is an equi-join on (band, key); verification is the
    exact ``bit_count(xor)`` — never all-pairs, false-positive-free.

    The live ``(id, hash)`` frame materializes ONCE — lazily, at the
    first action (r16 optimization, guide §1.2 — the
    ``incremental_image_neardup`` discipline applied to the batch op):
    without it BOTH sides of the banded self-join re-run the producing
    plan, and when that plan is the Arrow decode+hash pass — the op's
    dominant cost — the pass executes twice per action (event-log
    profile of ``image_phash_neardup``: two ~3 s hash jobs plus a ~4 s
    driver gap building the broadcast side from scratch).
    ``eager=False`` (probed: one evaluation even across the broadcast
    build's separate job, reused by later actions, and a fresh RDD per
    call — never a cross-run cache) keeps the op a lazy transformation
    for callers; localCheckpoint truncates lineage; the frame is
    (id, hash) — never payload bytes."""
    live = (
        hashes.filter(F.col(hash_col).isNotNull())
        .select(id_col, hash_col)
        .localCheckpoint(eager=False)
    )
    banded = _banded_hashes(live, id_col, hash_col, bands)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{hash_col}").alias("__ha"),
            F.col(f"b.{hash_col}").alias("__hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", hamming64("__ha", "__hb").cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def incremental_image_neardup(
    hashes: DataFrame,
    seen_bands: DataFrame | None,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    bands: int = 4,
    max_hamming: int = 6,
    claim: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Incremental image near-dup against a PERSISTED band index (r16,
    VERDICT r15 item 5) — the continuous-crawl analog of
    ``dedup.incremental_minhash_dedup`` for perceptual hashes: each crawl
    batch dedups against the committed ``(band, bkey, img_id, hash)``
    state, never against the image corpus, so a re-crawl re-hashes and
    re-pairs only ITS OWN batch.

    ``hashes`` is a batch's ``(id, hash)`` frame (``image_dhash`` output;
    NULL hashes — undecodable payloads — pass through as novel and never
    enter the index). Per batch, mirroring the MinHash discipline exactly:

    * WITHIN-batch pairs from the banded self-join, verified by exact
      ``bit_count(xor) <= max_hamming`` (never all-pairs);
    * AGAINST-state hits from a ``(band, bkey)`` equi-join of the batch's
      band rows against the index, verified the same way — at scale both
      sides hash-partition on the equi-keys, so the probe cost is the
      batch's band rows, not the state's;
    * batch images cluster over verified within-batch pairs
      (``dedup.connected_components``; singletons are their own cluster);
      a cluster with ANY member near a state image drops WHOLE (its
      content is already represented); otherwise the min-id member
      survives.

    Returns ``(novel_hash_rows, band_delta)`` — the delta holds the
    SURVIVORS' band rows + hashes for the merge sink (``merge_key:
    [img_id, band]``, insert-only). Re-ingesting an absorbed batch is a
    content-level no-op: every image matches its own indexed hash at
    distance 0 and every cluster is state-hit.

    ``claim`` (streaming exactly-once, the ``incremental_dedup``
    contract): a literal tagging the ingestion unit; the delta carries it
    as ``claim_batch`` and the against-state lookup ignores index rows of
    this batch's own claim, so a retry whose state merge already
    committed reconstructs the pre-batch state view bit-for-bit."""
    from .dedup import connected_components

    # Materialize the batch's hash frame ONCE (r16 optimization, guide
    # §1.2): everything below — the banded self-join's two sides, the
    # against-state probe, clustering, survivor selection, and both
    # returned frames — re-references this frame, and without a
    # materialization each action re-runs the producing plan (an Arrow
    # decode + hash pass over the crawl batch, the increment's dominant
    # cost). localCheckpoint (the k-means/CC idiom) truncates lineage and
    # lets the ContextCleaner reclaim the blocks when the returned frames
    # are dropped; the frame is (id, hash) — KBs per batch, never payload
    # bytes. LAZY like the batch sibling (r17, VERDICT r16 item 6 — one
    # idiom): the hash pass materializes once at the CC loop's first
    # iteration instead of at call time, so callers keep a lazy
    # transformation surface and the bench needs no TIME_INCLUDES_BUILD
    # special-casing; single evaluation across all downstream actions is
    # pinned by tests/test_images.py::test_incremental_neardup_single_hash_evaluation.
    hashes = hashes.localCheckpoint(eager=False)
    batch_ids = hashes.select(F.col(id_col)).distinct()
    banded = _banded_hashes(hashes, id_col, hash_col, bands)
    a, b = banded.alias("a"), banded.alias("b")
    within = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{hash_col}").alias("__ha"),
            F.col(f"b.{hash_col}").alias("__hb"),
        )
        .distinct()
        .filter(hamming64("__ha", "__hb") <= max_hamming)
        .select("id_a", "id_b")
    )
    if seen_bands is None:
        state_dups = batch_ids.limit(0)
    else:
        if claim is not None:
            seen_bands = seen_bands.where(F.col("claim_batch") != claim)
        st = seen_bands.select(
            "band", "bkey", F.col(hash_col).alias("__st_hash")
        )
        state_dups = (
            banded.join(st, on=["band", "bkey"])
            .filter(hamming64(hash_col, "__st_hash") <= max_hamming)
            .select(id_col)
            .distinct()
        )
    clusters = connected_components(within, "id_a", "id_b").select(
        F.col("doc_id").alias(id_col), "cluster_id"
    )
    membership = batch_ids.join(clusters, on=id_col, how="left").select(
        id_col, F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id")
    )
    dead_clusters = (
        membership.join(state_dups, on=id_col, how="left_semi")
        .select("cluster_id")
        .distinct()
    )
    survivors = (
        membership.join(dead_clusters, on="cluster_id", how="left_anti")
        .where(F.col(id_col) == F.col("cluster_id"))
        .select(id_col)
    )
    novel_rows = hashes.join(survivors, on=id_col, how="left_semi")
    band_delta = banded.join(survivors, on=id_col, how="left_semi").select(
        "band", "bkey", id_col, hash_col
    )
    if claim is not None:
        band_delta = band_delta.withColumn("claim_batch", claim)
    return novel_rows, band_delta


# ---------------------------------------------------------------------------
# Deterministic fixture: REAL PNGs whose decoded 9×8 box-resize is a
# closed-form md5 grid — what gives the catalog row a full value-hash
# oracle over the real encode → decode → resize → hash pipeline (the
# encode_text_png convention of multimodal.py, at dHash-grid size).
# ---------------------------------------------------------------------------


def _grid_bytes(text: str) -> list[int]:
    """72 grid bytes (9×8, row-major) from five chained md5 digests —
    md5(text + '#' + chunk) — so the 64 gradient comparisons are
    (near-)independent: a single-digest tiling would repeat the same 16
    byte comparisons and collapse dHash entropy to 16 bits."""
    out: list[int] = []
    for chunk in range(5):
        out.extend(hashlib.md5(f"{text}#{chunk}".encode()).digest())
    return out[: DHASH_W * DHASH_H]


def _png_gray(width: int, height: int, rows: list[list[int]]) -> bytes:
    """Genuine 8-bit grayscale PNG (filter 0 rows) — the same chunk/CRC
    construction as ``multimodal.encode_text_png``, at arbitrary size."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0))
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (
        b"\x89PNG\r\n\x1a\n"
        + ihdr
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_grid_png(
    df: DataFrame,
    scale: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    brightness: int = 0,
) -> DataFrame:
    """Each doc becomes a REAL ``9·scale × 8·scale`` grayscale PNG whose
    pixels tile the 72-byte md5 grid in constant ``scale × scale`` blocks
    — so the exact box resize back to 9×8 reproduces the grid bytes
    bit-for-bit at ANY scale (the resize-invariance the near-dup row
    exercises: the same content re-encoded at scale 2 and scale 3 must
    hash identically). ``brightness`` adds a constant and RAISES if any
    grid byte would leave 0..255 (r16 advisor finding: md5-derived grid
    bytes span the full range, so a silent ``min(255, …)`` clamp — or a
    byte pushed below 0 crashing deep inside the PNG row pack — could
    collapse two distinct values and flip dHash gradient bits; the exact
    monotone-map invariance this fixture exists to exercise must fail
    loudly, not change hashes)."""

    df, id_type = _mid_input(df, id_col, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf[_MVAL]:
                g = _grid_bytes(str(text))
                if brightness and not (
                    0 <= min(g) + brightness and max(g) + brightness <= 255
                ):
                    raise ValueError(
                        f"encode_grid_png: brightness={brightness} pushes "
                        f"grid bytes [{min(g)}, {max(g)}] outside 0..255 — "
                        "the shift would no longer be a strictly monotone "
                        "map of the pixel range"
                    )
                rows = [
                    [
                        g[(ro // scale) * DHASH_W + (co // scale)] + brightness
                        for co in range(DHASH_W * scale)
                    ]
                    for ro in range(DHASH_H * scale)
                ]
                payloads.append(_png_gray(DHASH_W * scale, DHASH_H * scale, rows))
            yield pd.DataFrame({_MID: pdf[_MID], "payload": payloads})

    return df.mapInPandas(
        run, schema=f"{_MID} {id_type}, payload binary"
    ).withColumnRenamed(_MID, id_col)


def _dhash_hashes_ctes(table: str) -> str:
    """The shared closed-form grid → gradient bits → packed-long CTEs —
    ONE definition for every dHash oracle generator (r16 review finding:
    a third hand-copied instance had appeared; drifted copies of the
    float-free closed form are exactly the hazard the generators exist to
    prevent). Emits ``bytes``, ``cmp`` and ``hashes`` (doc_id → dhash);
    callers prepend ``WITH [RECURSIVE]`` and append their own CTEs."""
    return f"""bytes AS (
      SELECT doc_id, idx,
             CAST(('0x' || substr(
               md5(text || '#' || CAST(idx // 16 AS VARCHAR)),
               (idx % 16) * 2 + 1, 2)) AS INT) AS pv
      FROM {table}, (SELECT unnest(range(72)) AS idx)
    ), cmp AS (
      SELECT a.doc_id,
             (a.idx // 9) * 8 + (a.idx % 9) AS bi,
             CASE WHEN a.pv < b.pv THEN 1 ELSE 0 END AS bit
      FROM bytes a
      JOIN bytes b ON b.doc_id = a.doc_id AND b.idx = a.idx + 1
      WHERE a.idx % 9 < 8
    ), hashes AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN bit = 1 THEN (
               CASE WHEN bi = 0 THEN {_MIN_LONG}
                    ELSE (1::BIGINT << (63 - bi)) END
             ) ELSE 0 END) AS BIGINT) AS dhash
      FROM cmp GROUP BY doc_id
    )"""


def dhash_neardup_oracle_sql(
    table: str = "documents",
    variant_mod: int = 5,
    bands: int = 4,
    max_hamming: int = 6,
) -> str:
    """DuckDB mirror of the ``image_dhash_neardup`` catalog row: replay
    the md5 grid → gradient bits → MSB-first pack → banding → exact
    Hamming verify, closed-form from the raw text (the PNG encode →
    decode → box resize being exact is precisely what the row pins).
    Image ids: base = doc_id·2 (scale 2), variant = doc_id·2+1 (scale 3,
    docs with ``doc_id % variant_mod = 0``) — same grid, so every
    variant pairs with its base at Hamming 0."""
    width = 64 // bands
    mask = (1 << width) - 1
    return f"""
    WITH {_dhash_hashes_ctes(table)}, imgs AS (
      SELECT doc_id * 2 AS img_id, dhash FROM hashes
      UNION ALL
      SELECT doc_id * 2 + 1 AS img_id, dhash FROM hashes
      WHERE doc_id % {variant_mod} = 0
    ), banded AS (
      SELECT img_id, dhash, band,
             (dhash >> ({width} * band)) & {mask} AS bkey
      FROM imgs, (SELECT unnest(range({bands})) AS band)
    ), cand AS (
      SELECT DISTINCT a.img_id AS id_a, b.img_id AS id_b,
                      a.dhash AS ha, b.dhash AS hb
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
                   AND a.img_id < b.img_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}
    """


def dhash_survivors_oracle_sql(
    table: str = "documents",
    variant_mod: int = 5,
    bands: int = 4,
    max_hamming: int = 6,
) -> str:
    """DuckDB mirror of the ``image_dedup_survivors`` catalog row (r16
    review finding: the first cut lived as a hand-copied inline SQL in
    the catalog with the band shift hard-coded at 16 — the exact drift
    class ``dhash_neardup_oracle_sql``'s width fix closed this round; ONE
    parameterized generator beside the other two keeps the closed form in
    one module): hashes → banding → exact-Hamming pairs → recursive-CTE
    transitive closure → min-id representative per cluster (singletons
    are their own cluster)."""
    width = 64 // bands
    mask = (1 << width) - 1
    return f"""
    WITH RECURSIVE {_dhash_hashes_ctes(table)}, imgs AS (
      SELECT doc_id * 2 AS img_id, dhash FROM hashes
      UNION ALL
      SELECT doc_id * 2 + 1 AS img_id, dhash FROM hashes
      WHERE doc_id % {variant_mod} = 0
    ), banded AS (
      SELECT img_id, dhash, band,
             (dhash >> ({width} * band)) & {mask} AS bkey
      FROM imgs, (SELECT unnest(range({bands})) AS band)
    ), v AS (
      SELECT DISTINCT a.img_id AS id_a, b.img_id AS id_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
                   AND a.img_id < b.img_id
      WHERE bit_count(xor(a.dhash, b.dhash)) <= {max_hamming}
    ), e AS (SELECT id_a AS src, id_b AS dst FROM v
             UNION SELECT id_b, id_a FROM v),
    reach(node, r) AS (
      SELECT src, src FROM e
      UNION
      SELECT reach.node, e2.dst FROM reach JOIN e e2 ON reach.r = e2.src
    ), cc AS (SELECT node AS img_id, min(r) AS cluster_id FROM reach GROUP BY node),
    mem AS (
      SELECT i.img_id, COALESCE(cc.cluster_id, i.img_id) AS cluster_id
      FROM (SELECT img_id FROM imgs) i LEFT JOIN cc USING (img_id)
    )
    SELECT img_id FROM mem WHERE img_id = cluster_id
    """


def incremental_image_neardup_oracle_sql(
    table: str = "documents",
    variant_mod: int = 10,
    bands: int = 4,
    max_hamming: int = 6,
) -> str:
    """DuckDB replay of TWO ``incremental_image_neardup`` increments
    through the persisted band index (the ``_incremental_minhash_state_oracle``
    discipline at dHash granularity): batch 1 = even doc_ids' base images
    (state starts empty), batch 2 = odd doc_ids' base images PLUS
    re-encoded 3×-scale variants of every ``doc_id % variant_mod = 0``
    doc — each variant hashes identically to its batch-1 base, so the
    against-state join must drop it whole while the novel odd images
    survive into the index. Mirrors the operator stage by stage — grid →
    gradient bits → pack (the ``dhash_neardup_oracle_sql`` closed form),
    banding, within-batch band self-join verified by exact
    ``bit_count(xor)``, recursive-CTE connected components with singleton
    membership, whole-cluster drop on state hits, survivors' band rows
    appended — so the final ``(band, bkey, img_id, dhash)`` multiset pins
    the operator AND the sink-committed index together."""
    width = 64 // bands
    mask = (1 << width) - 1

    def batch_ctes(n: int, imgs_cte: str, with_state: bool) -> str:
        sd = (
            f"""
    sd{n} AS (
      SELECT DISTINCT bb.img_id
      FROM b{n} bb JOIN state1 st ON bb.band = st.band AND bb.bkey = st.bkey
      WHERE bit_count(xor(bb.dhash, st.dhash)) <= {max_hamming}
    ),
    dead{n} AS (SELECT DISTINCT cluster_id FROM mem{n} JOIN sd{n} USING (img_id)),"""
            if with_state
            else f"""
    dead{n} AS (SELECT NULL::BIGINT AS cluster_id WHERE false),"""
        )
        return f"""
    b{n} AS (
      SELECT img_id, dhash, CAST(band AS INT) AS band,
             (dhash >> ({width} * band)) & {mask} AS bkey
      FROM {imgs_cte}, (SELECT unnest(range({bands})) AS band)
    ),
    v{n} AS (
      SELECT DISTINCT a.img_id AS id_a, b.img_id AS id_b
      FROM b{n} a JOIN b{n} b ON a.band = b.band AND a.bkey = b.bkey
                             AND a.img_id < b.img_id
      WHERE bit_count(xor(a.dhash, b.dhash)) <= {max_hamming}
    ),
    e{n} AS (SELECT id_a AS src, id_b AS dst FROM v{n}
             UNION SELECT id_b, id_a FROM v{n}),
    reach{n}(node, r) AS (
      SELECT src, src FROM e{n}
      UNION
      SELECT reach{n}.node, e.dst FROM reach{n} JOIN e{n} e ON reach{n}.r = e.src
    ),
    cc{n} AS (SELECT node AS img_id, min(r) AS cluster_id FROM reach{n} GROUP BY node),
    mem{n} AS (
      SELECT s.img_id, COALESCE(cc{n}.cluster_id, s.img_id) AS cluster_id
      FROM (SELECT DISTINCT img_id FROM b{n}) s LEFT JOIN cc{n} USING (img_id)
    ),{sd}
    surv{n} AS (
      SELECT img_id FROM mem{n}
      WHERE img_id = cluster_id
        AND cluster_id NOT IN (SELECT cluster_id FROM dead{n} WHERE cluster_id IS NOT NULL)
    ),
    state{n} AS (SELECT band, bkey, img_id, dhash FROM b{n} JOIN surv{n} USING (img_id))"""

    return f"""
    WITH RECURSIVE {_dhash_hashes_ctes(table)}, imgs1 AS (
      SELECT doc_id * 2 AS img_id, dhash FROM hashes WHERE doc_id % 2 = 0
    ), imgs2 AS (
      SELECT doc_id * 2 AS img_id, dhash FROM hashes WHERE doc_id % 2 = 1
      UNION ALL
      SELECT doc_id * 2 + 1 AS img_id, dhash FROM hashes
      WHERE doc_id % {variant_mod} = 0
    ),{batch_ctes(1, "imgs1", False)},{batch_ctes(2, "imgs2", True)}
    SELECT band, bkey, img_id, dhash FROM state1
    UNION ALL
    SELECT band, bkey, img_id, dhash FROM state2
    """
