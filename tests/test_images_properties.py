"""Property pins for the r15 perceptual-hash machinery (post-seal,
test-only): the mathematical claims the catalog row's single fixture
cannot exhaust — pack/band algebra over the full 64-bit space, box-resize
exactness at even ratios, and dHash invariance under arbitrary strictly
monotone maps."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from embulk_executor_mapreduce_spark.operators.images import (
    DHASH_H,
    DHASH_W,
    _box_resize,
    _dhash_from_lum,
    _pack_bits,
)


@given(st.lists(st.booleans(), min_size=64, max_size=64))
def test_pack_bits_is_a_bijection_onto_signed_longs(bits):
    """MSB-first sign-aware pack: every 64-bit pattern lands in the
    signed long range, unpacks to the same bits (the band extraction's
    arithmetic-shift-and-mask), and bit 0 is exactly the sign."""
    v = _pack_bits(bits)
    assert -(1 << 63) <= v <= (1 << 63) - 1
    assert (v < 0) == bits[0]
    unpacked = [(v >> (63 - i)) & 1 == 1 for i in range(64)]
    assert unpacked == bits
    # band keys (the Spark/DuckDB extraction) reassemble the value
    bands = [(v >> (16 * b)) & 0xFFFF for b in range(4)]
    re = sum(k << (16 * b) for b, k in enumerate(bands))
    assert re - (1 << 64) * (re >> 63 & 1) == v


@given(
    st.integers(min_value=1, max_value=4),
    st.lists(
        st.integers(min_value=0, max_value=255),
        min_size=DHASH_W * DHASH_H,
        max_size=DHASH_W * DHASH_H,
    ),
)
@settings(max_examples=60, deadline=None)
def test_box_resize_order_exact_at_even_ratios(scale, values):
    """The fixture oracle's ACTUAL precision contract (this test first
    asserted bit-exact means and FOUND the ~1e-14 residue at 1/3-weight
    ratios — a real latent over-claim, docstring corrected): power-of-two
    ratios are bit-exact; any even ratio is ORDER-exact — equal-integer
    blocks give bit-identical means, distinct integers stay separated by
    ~1 against ≤1e-12 residue — which is precisely what strict ``<``
    (the dHash bit) needs."""
    grid = np.array(values, dtype=float).reshape(DHASH_H, DHASH_W)
    big = np.kron(grid, np.ones((scale, scale)))
    out = _box_resize(big, DHASH_W, DHASH_H)
    if scale in (1, 2, 4):
        assert np.array_equal(out, grid)
    assert np.abs(out - grid).max() <= 1e-12
    # equal-integer blocks → bit-identical means (the equal-adjacent
    # dHash bit cannot flip); distinct integers keep their exact order
    for r in range(DHASH_H):
        for c in range(DHASH_W - 1):
            if grid[r, c] == grid[r, c + 1]:
                assert out[r, c] == out[r, c + 1]
            else:
                assert (out[r, c] < out[r, c + 1]) == (
                    grid[r, c] < grid[r, c + 1]
                )


@given(
    st.lists(
        st.integers(min_value=0, max_value=255),
        min_size=DHASH_W * DHASH_H,
        max_size=DHASH_W * DHASH_H,
    ),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=40),
    st.floats(min_value=0.1, max_value=4.0, allow_nan=False),
)
@settings(max_examples=60, deadline=None)
def test_dhash_invariant_under_scale_and_monotone_maps(
    values, scale, shift, gain
):
    """dHash depends only on the ORDER of adjacent luminance means, so it
    is invariant under any strictly increasing affine map (gain > 0,
    arbitrary shift) composed with exact integer rescaling — the formal
    statement behind the re-encode/brightness pytest pins."""
    lum = [values[r * DHASH_W : (r + 1) * DHASH_W] for r in range(DHASH_H)]
    base = _dhash_from_lum(lum)
    big = np.kron(np.array(lum, dtype=float), np.ones((scale, scale)))
    mapped = (big * gain + shift).tolist()
    assert _dhash_from_lum(mapped) == base


@given(st.integers(min_value=0, max_value=(1 << 64) - 1), st.integers(0, 63))
def test_single_bit_flip_changes_exactly_one_band(h_u, flip):
    """The banding soundness lemma: flipping k bits touches at most k
    bands, so any pair within Hamming d < 4 shares ≥ 1 exact band — here
    the k=1 base case over the whole space."""
    a = h_u - (1 << 64) * (h_u >> 63)
    b_u = h_u ^ (1 << flip)
    b = b_u - (1 << 64) * (b_u >> 63)
    diff = sum(
        1
        for band in range(4)
        if ((a >> (16 * band)) & 0xFFFF) != ((b >> (16 * band)) & 0xFFFF)
    )
    assert diff == 1
