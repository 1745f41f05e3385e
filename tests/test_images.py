"""Perceptual image hashing + Hamming-banded near-dup (r15, VERDICT r14
item 1): dHash/pHash over REAL decoded pixels, the invariance classes
that make them PERCEPTUAL (re-scale, re-encode, brightness), banding
completeness/selectivity, and the decoder quarantine contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from embulk_executor_mapreduce_spark.operators.images import (
    DHASH_H,
    DHASH_W,
    _grid_bytes,
    _pack_bits,
    _png_gray,
    encode_grid_png,
    image_dhash,
    image_neardup_pairs,
    image_phash,
)


def _docs(spark, n=12):
    return spark.createDataFrame(
        [(i, f"image fixture text {i}") for i in range(n)],
        "doc_id long, text string",
    )


def _png_df(spark, rows_by_id):
    """(doc_id, payload) frame of hand-built grayscale PNGs."""
    data = [
        (i, _png_gray(len(rows[0]), len(rows), rows))
        for i, rows in rows_by_id.items()
    ]
    return spark.createDataFrame(data, "doc_id long, payload binary")


def _grid_rows(values, scale=1, shift=0):
    """9×8 grid → (9·scale)×(8·scale) pixel rows in constant blocks."""
    return [
        [values[(r // scale) * DHASH_W + (c // scale)] + shift
         for c in range(DHASH_W * scale)]
        for r in range(DHASH_H * scale)
    ]


def test_dhash_matches_closed_form_grid(spark):
    """The real encode → decode → box-resize → hash pipeline reproduces
    the closed-form gradient-sign pack from the md5 grid bytes — the
    exactness claim the catalog row's oracle rests on."""
    docs = _docs(spark, 3)
    hashes = {
        r.doc_id: (r.width, r.height, r.dhash)
        for r in image_dhash(encode_grid_png(docs, scale=2)).collect()
    }
    for i in range(3):
        g = _grid_bytes(f"image fixture text {i}")
        bits = [
            g[r * DHASH_W + c] < g[r * DHASH_W + c + 1]
            for r in range(DHASH_H)
            for c in range(DHASH_W - 1)
        ]
        assert hashes[i] == (18, 16, _pack_bits(bits))


def test_perceptual_invariance_scale_and_brightness(spark):
    """The invariance classes byte-hash dedup cannot see: the SAME
    content re-encoded at 2×/3×/5× scale and brightness-shifted (+25, no
    clamp) hashes IDENTICALLY under dHash (gradient ORDER survives any
    strictly monotone map) and pHash (the dropped DC coefficient is the
    only one a constant shift moves)."""
    base_vals = [((r * 9 + c) * 37) % 200 for r in range(8) for c in range(9)]
    variants = {
        0: _grid_rows(base_vals, scale=2),
        1: _grid_rows(base_vals, scale=3),
        2: _grid_rows(base_vals, scale=5),
        3: _grid_rows(base_vals, scale=2, shift=25),
        4: _grid_rows([v + 7 for v in reversed(base_vals)], scale=2),  # distinct
    }
    imgs = _png_df(spark, variants)
    dh = {r.doc_id: r.dhash for r in image_dhash(imgs).collect()}
    ph = {r.doc_id: r.phash for r in image_phash(imgs).collect()}
    assert dh[0] == dh[1] == dh[2] == dh[3]
    assert ph[0] == ph[1] == ph[2] == ph[3]
    assert dh[4] != dh[0] and ph[4] != ph[0]


def test_undecodable_payloads_quarantine_and_never_pair(spark):
    """Decoder contract: garbage payloads keep NULL dims/hash (data, not
    a crash) and NULL hashes never enter the band join."""
    good = encode_grid_png(_docs(spark, 2), scale=2)
    bad = spark.createDataFrame(
        [(99, bytearray(b"not an image at all"))], "doc_id long, payload binary"
    )
    hashes = image_dhash(good.unionByName(bad))
    rows = {r.doc_id: r.dhash for r in hashes.collect()}
    assert rows[99] is None and rows[0] is not None
    pairs = image_neardup_pairs(hashes, max_hamming=64)
    assert not any(
        99 in (r.id_a, r.id_b) for r in pairs.collect()
    )


def test_banding_completeness_and_selectivity(spark):
    """Pigeonhole guarantee: with 4 bands, any pair within Hamming 3
    shares at least one untouched 16-bit band — always surfaced; a pair
    sharing a band but beyond max_hamming is candidate-then-REJECTED by
    the exact bit_count verify (banding adds recall, never false
    positives)."""
    base = 0x1234_5678_9ABC_DEF0
    flip3 = base ^ (1 << 0) ^ (1 << 17) ^ (1 << 33)  # 3 bands touched
    shares_band = (base & 0xFFFF) | (0x7777_7777_7777 << 16)  # band 0 equal
    hashes = spark.createDataFrame(
        [(1, base), (2, flip3), (3, shares_band)], "doc_id long, dhash long"
    )
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in image_neardup_pairs(hashes, max_hamming=3).collect()
    }
    assert got == {(1, 2): 3}
    # at a looser threshold the shared-band candidate passes the verify
    loose = {
        (r.id_a, r.id_b): r.hamming
        for r in image_neardup_pairs(hashes, max_hamming=64).collect()
    }
    assert (1, 3) in loose and loose[(1, 3)] > 3


def test_neardup_row_shape(spark):
    """The catalog row's fixture semantics at unit scale: every %5 doc's
    3×-rescaled variant pairs with its base at Hamming 0; nothing else
    pairs at the tight threshold."""
    docs = _docs(spark, 10)
    base = encode_grid_png(docs, scale=2).select(
        (F.col("doc_id") * 2).alias("img_id"), "payload"
    )
    var = encode_grid_png(docs.filter(F.col("doc_id") % 5 == 0), scale=3).select(
        (F.col("doc_id") * 2 + 1).alias("img_id"), "payload"
    )
    pairs = image_neardup_pairs(
        image_dhash(base.unionByName(var), id_col="img_id"),
        id_col="img_id",
        max_hamming=6,
    )
    assert sorted(map(tuple, pairs.collect())) == [
        (0, 1, 0), (10, 11, 0)
    ]


def test_null_payload_and_nonlong_ids(spark):
    """r15 review findings: a NULL payload (optional-column join)
    quarantines like any unparseable image instead of crashing the Arrow
    pass, and the id column rides through at ITS OWN type (string URIs
    here) rather than a hardcoded long."""
    good = encode_grid_png(
        spark.createDataFrame(
            [("img://a", "alpha text"), ("img://b", "beta text")],
            "uri string, text string",
        ),
        scale=2,
        id_col="uri",
    )
    nulled = spark.createDataFrame(
        [("img://nil", None)], "uri string, payload binary"
    )
    hashes = image_dhash(good.unionByName(nulled), id_col="uri")
    assert dict(hashes.dtypes)["uri"] == "string"
    rows = {r.uri: r.dhash for r in hashes.collect()}
    assert rows["img://nil"] is None
    assert rows["img://a"] is not None and rows["img://a"] != rows["img://b"]
    pairs = image_neardup_pairs(hashes, id_col="uri", max_hamming=64)
    assert not any(
        "nil" in r.id_a or "nil" in r.id_b for r in pairs.collect()
    )


def test_brightness_clamp_raises_not_silently_flips(spark):
    """r16 advisor finding: md5 grid bytes reach 255, so a positive
    brightness that would clamp must FAIL LOUDLY — a silent min(255, …)
    could collapse two distinct values and flip gradient bits, breaking
    the monotone-map invariance this fixture exists to exercise."""
    import pytest

    docs = _docs(spark, 12)
    with pytest.raises(Exception, match="monotone"):
        encode_grid_png(docs, scale=2, brightness=25).collect()
    # the symmetric low end (r16 review finding): a negative shift that
    # would push a byte below 0 must fail the same way, not crash deep
    # inside the PNG row pack
    with pytest.raises(Exception, match="monotone"):
        encode_grid_png(docs, scale=2, brightness=-25).collect()
    # brightness=0 stays the exact fixture: hashes match the closed form
    assert image_dhash(encode_grid_png(docs, scale=2)).count() == 12


def test_oracle_band_shift_tracks_bands_param(spark, tmp_path):
    """r16 advisor finding: dhash_neardup_oracle_sql hardcoded the band
    shift at 16 bits, so any bands != 4 diverged from
    image_neardup_pairs' b·width shift. Pin Spark ≡ DuckDB at bands=8."""
    import duckdb

    from embulk_executor_mapreduce_spark.operators.images import (
        dhash_neardup_oracle_sql,
    )

    docs = _docs(spark, 15)
    base = encode_grid_png(docs, scale=2).select(
        (F.col("doc_id") * 2).alias("img_id"), "payload"
    )
    var = encode_grid_png(docs.filter(F.col("doc_id") % 5 == 0), scale=3).select(
        (F.col("doc_id") * 2 + 1).alias("img_id"), "payload"
    )
    spark_pairs = sorted(
        map(
            tuple,
            image_neardup_pairs(
                image_dhash(base.unionByName(var), id_col="img_id"),
                id_col="img_id",
                bands=8,
                max_hamming=6,
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, 'image fixture text {i}')" for i in range(15))
        + ") t(doc_id, text)"
    )
    duck_pairs = sorted(
        map(tuple, con.execute(dhash_neardup_oracle_sql(bands=8)).fetchall())
    )
    assert spark_pairs == duck_pairs and len(spark_pairs) >= 3


def test_incremental_drops_recrawled_variants(spark, tmp_path):
    """r16 incremental state: a second crawl batch containing re-encoded
    variants of already-indexed images drops them against the (band,
    bkey) state probe, while genuinely novel images survive into the
    index delta."""
    from embulk_executor_mapreduce_spark.operators.images import (
        image_dhash,
        incremental_image_neardup,
    )
    from embulk_executor_mapreduce_spark.sinks.writer import (
        read_merge_state,
        write_sink,
    )
    from embulk_executor_mapreduce_spark.spec import SinkSpec

    docs = _docs(spark, 10)
    path = str(tmp_path / "band_index")
    sink = SinkSpec(
        type="parquet", path=path, mode="merge",
        merge_key=("img_id", "band"), merge_order=("bkey",),
    )
    b1 = image_dhash(
        encode_grid_png(docs.filter(F.col("doc_id") % 2 == 0), scale=2).select(
            (F.col("doc_id") * 2).alias("img_id"), "payload"
        ),
        id_col="img_id",
    ).select("img_id", "dhash")
    n1, d1 = incremental_image_neardup(b1, None, id_col="img_id")
    assert {r.img_id for r in n1.collect()} == {0, 4, 8, 12, 16}
    write_sink(d1, sink)
    # batch 2: odd bases (novel) + 3x-rescaled variants of docs 0 and 5
    b2 = image_dhash(
        encode_grid_png(docs.filter(F.col("doc_id") % 2 == 1), scale=2)
        .select((F.col("doc_id") * 2).alias("img_id"), "payload")
        .unionByName(
            encode_grid_png(
                docs.filter(F.col("doc_id").isin(0, 5)), scale=3
            ).select((F.col("doc_id") * 2 + 1).alias("img_id"), "payload")
        ),
        id_col="img_id",
    ).select("img_id", "dhash")
    n2, d2 = incremental_image_neardup(
        b2, read_merge_state(spark, path), id_col="img_id"
    )
    got = {r.img_id for r in n2.collect()}
    # doc 0's variant (img 1) hits the state and drops; doc 5's variant
    # (img 11) is a re-encode of the NOVEL odd doc 5 base (img 10) — they
    # pair within-batch, cluster, and the min-id member survives
    assert got == {2, 6, 10, 14, 18}
    write_sink(d2, sink)
    state_ids = {
        r.img_id for r in read_merge_state(spark, path).select("img_id").collect()
    }
    assert state_ids == {0, 4, 8, 12, 16, 2, 6, 10, 14, 18}


def test_incremental_reingest_is_content_noop(spark, tmp_path):
    """Replaying an absorbed batch: every image matches its own indexed
    hash at distance 0, every cluster is state-hit, nothing survives."""
    from embulk_executor_mapreduce_spark.operators.images import (
        image_dhash,
        incremental_image_neardup,
    )
    from embulk_executor_mapreduce_spark.sinks.writer import (
        read_merge_state,
        write_sink,
    )
    from embulk_executor_mapreduce_spark.spec import SinkSpec

    docs = _docs(spark, 6)
    path = str(tmp_path / "band_index")
    sink = SinkSpec(
        type="parquet", path=path, mode="merge",
        merge_key=("img_id", "band"), merge_order=("bkey",),
    )
    batch = image_dhash(
        encode_grid_png(docs, scale=2).select(
            F.col("doc_id").alias("img_id"), "payload"
        ),
        id_col="img_id",
    ).select("img_id", "dhash")
    _, d1 = incremental_image_neardup(batch, None, id_col="img_id")
    write_sink(d1, sink)
    before = sorted(map(tuple, read_merge_state(spark, path).collect()))
    n2, d2 = incremental_image_neardup(
        batch, read_merge_state(spark, path), id_col="img_id"
    )
    assert n2.count() == 0 and d2.count() == 0
    write_sink(d2, sink)  # empty delta: state unchanged
    assert sorted(map(tuple, read_merge_state(spark, path).collect())) == before


def test_incremental_claim_reconstructs_prebatch_view(spark, tmp_path):
    """Exactly-once retry: with the batch's claim filtered from the state
    view, a retry whose state merge already committed reproduces the
    original survivor set instead of collapsing to empty."""
    from embulk_executor_mapreduce_spark.operators.images import (
        image_dhash,
        incremental_image_neardup,
    )
    from embulk_executor_mapreduce_spark.sinks.writer import (
        read_merge_state,
        write_sink,
    )
    from embulk_executor_mapreduce_spark.spec import SinkSpec

    docs = _docs(spark, 6)
    path = str(tmp_path / "band_index")
    sink = SinkSpec(
        type="parquet", path=path, mode="merge",
        merge_key=("img_id", "band"), merge_order=("bkey",),
    )
    batch = image_dhash(
        encode_grid_png(docs, scale=2).select(
            F.col("doc_id").alias("img_id"), "payload"
        ),
        id_col="img_id",
    ).select("img_id", "dhash")
    n1, d1 = incremental_image_neardup(
        batch, None, id_col="img_id", claim=F.lit(7)
    )
    write_sink(d1, sink)  # the commit landed; the job then "crashed"
    n_retry, d_retry = incremental_image_neardup(
        batch, read_merge_state(spark, path), id_col="img_id", claim=F.lit(7)
    )
    assert sorted(map(tuple, n_retry.collect())) == sorted(map(tuple, n1.collect()))
    assert sorted(map(tuple, d_retry.collect())) == sorted(map(tuple, d1.collect()))


def test_incremental_neardup_single_hash_evaluation(spark):
    """The lazy call-time checkpoint (r17, VERDICT r16 item 6 — unified
    with the batch sibling's idiom) still evaluates the incoming hash
    frame exactly ONCE across every downstream action: the banded
    self-join's build+probe, clustering, and both returned frames all
    read the checkpointed rows, so an accumulator-instrumented input
    fires once per row, not once per action."""
    from embulk_executor_mapreduce_spark.operators.images import (
        image_dhash,
        incremental_image_neardup,
    )

    docs = _docs(spark, 10)
    hashes = image_dhash(
        encode_grid_png(docs, scale=2).select(
            (F.col("doc_id") * 2).alias("img_id"), "payload"
        ),
        id_col="img_id",
    ).select("img_id", "dhash")
    acc = spark.sparkContext.accumulator(0)

    def bump(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    counted = hashes.mapInPandas(bump, "img_id long, dhash long")
    novel, delta = incremental_image_neardup(counted, None, id_col="img_id")
    assert novel.count() == 10
    assert delta.count() > 0
    novel.collect()
    assert acc.value == 10
