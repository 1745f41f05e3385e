"""CDC tail × incremental image near-dup composition (r16): a
table_changes follow-mode feed over an upstream image merge table driving
the dHash band-index corpus sink — the fourth CDC-fed composition beside
the semantic / ANN-index / postings siblings — including the retry
interleavings the exactly-once construction must survive."""

from __future__ import annotations

from pyspark.sql import functions as F

from embulk_executor_mapreduce_spark.operators.images import encode_grid_png
from embulk_executor_mapreduce_spark.sinks.writer import (
    read_merge_state,
    write_sink,
)
from embulk_executor_mapreduce_spark.spec import SinkSpec
from embulk_executor_mapreduce_spark.streaming.ingest import (
    incremental_image_sink,
    run_cdc_image_ingest,
)


def _imgs(spark, rows, rev):
    """(img_id, payload, rev) frame of REAL grid PNGs: rows are
    (img_id, content_text, scale) — same text at different scales decodes
    to the same 9×8 grid, i.e. a re-encoded near-dup."""
    frames = []
    for img_id, text, scale in rows:
        frames.append(
            encode_grid_png(
                spark.createDataFrame(
                    [(img_id, text)], "img_id long, text string"
                ),
                scale=scale,
                id_col="img_id",
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.withColumn("rev", F.lit(rev))


def _upstream(spark, tmp_path):
    """Three committed versions of an upstream image merge table: v0
    seeds images 0-2 (never delivered by a from_version=0 tail), v1
    inserts 10-13 with 13 a 3×-scale RE-ENCODE of 10's content
    (within-batch near-dup) plus an update re-crawling image 1 with NEW
    content, v2 inserts 20-21 with 21 a re-encode of 11's content — a
    STATE dup by then."""
    up = str(tmp_path / "upstream")
    sink = SinkSpec(
        type="parquet",
        path=up,
        mode="merge",
        merge_key=("img_id",),
        merge_order=("rev",),
        merge_keep_versions=4,
    )
    write_sink(
        _imgs(spark, [(i, f"seed {i}", 2) for i in range(3)], 0), sink
    )
    write_sink(
        _imgs(
            spark,
            [(10, "crawl ten", 2), (11, "crawl eleven", 2),
             (12, "crawl twelve", 2), (13, "crawl ten", 3),
             (1, "recrawled one", 2)],
            1,
        ),
        sink,
    )
    write_sink(
        _imgs(
            spark,
            [(20, "crawl twenty", 2), (21, "crawl eleven", 3)],
            2,
        ),
        sink,
    )
    return up


def _paths(tmp_path, name):
    return (
        str(tmp_path / name / "state"),
        str(tmp_path / name / "corpus"),
        str(tmp_path / name / "ckpt"),
    )


def test_cdc_feed_drives_image_dedup_e2e(spark, tmp_path):
    up = _upstream(spark, tmp_path)
    state, corpus, ckpt = _paths(tmp_path, "run")
    last = run_cdc_image_ingest(
        spark, up, ["img_id"], state, corpus, checkpoint=ckpt
    )
    assert last == 2
    b1 = {
        r["img_id"]
        for r in spark.read.parquet(f"{corpus}/ingest_batch=1").collect()
    }
    b2 = {
        r["img_id"]
        for r in spark.read.parquet(f"{corpus}/ingest_batch=2").collect()
    }
    # v1: 13 re-encodes 10's content — within-batch pair, min-id survives;
    # the update_postimage of image 1 arrives as novel content
    assert b1 == {10, 11, 12, 1}
    # v2: 21 re-encodes 11's content, which is IN the committed state —
    # dropped as a state dup; the novel 20 survives
    assert b2 == {20}
    st = read_merge_state(spark, state)
    assert set(
        r["claim_batch"] for r in st.select("claim_batch").distinct().collect()
    ) == {1, 2}
    assert {r["img_id"] for r in st.select("img_id").collect()} == b1 | b2


def test_cdc_image_retry_after_commit_is_idempotent(spark, tmp_path):
    """Version v's state merge COMMITTED but the checkpoint advance was
    lost — redelivery must reconstruct the pre-batch state view via the
    claim filter and converge bit-for-bit, not drop the batch as
    all-duplicate."""
    up = _upstream(spark, tmp_path)
    state, corpus, ckpt = _paths(tmp_path, "retry")
    run_cdc_image_ingest(
        spark, up, ["img_id"], state, corpus, checkpoint=ckpt, to_version=1
    )
    corpus_before = sorted(
        map(tuple, spark.read.parquet(f"{corpus}/ingest_batch=1").collect())
    )
    state_before = sorted(map(tuple, read_merge_state(spark, state).collect()))
    # lose the checkpoint advance: redeliver version 1 from scratch
    import os
    import shutil

    shutil.rmtree(ckpt)
    os.makedirs(ckpt)
    run_cdc_image_ingest(
        spark, up, ["img_id"], state, corpus, checkpoint=ckpt, to_version=1
    )
    assert sorted(
        map(tuple, spark.read.parquet(f"{corpus}/ingest_batch=1").collect())
    ) == corpus_before
    assert (
        sorted(map(tuple, read_merge_state(spark, state).collect()))
        == state_before
    )


def test_cdc_image_checkpoint_resume(spark, tmp_path):
    """Stopping after v1 and re-running delivers ONLY v2 — the resumed
    tail converges to the same final state as an uninterrupted run."""
    up = _upstream(spark, tmp_path)
    state, corpus, ckpt = _paths(tmp_path, "resume")
    run_cdc_image_ingest(
        spark, up, ["img_id"], state, corpus, checkpoint=ckpt, to_version=1
    )
    last = run_cdc_image_ingest(
        spark, up, ["img_id"], state, corpus, checkpoint=ckpt
    )
    assert last == 2
    state2, corpus2, ckpt2 = _paths(tmp_path, "oneshot")
    run_cdc_image_ingest(
        spark, up, ["img_id"], state2, corpus2, checkpoint=ckpt2
    )
    assert sorted(map(tuple, read_merge_state(spark, state).collect())) == sorted(
        map(tuple, read_merge_state(spark, state2).collect())
    )


def test_cdc_image_direct_process_matches_tail(spark, tmp_path):
    """The composition is value-invisible: feeding the same increments
    directly through incremental_image_sink (foreachBatch-style) equals
    the table_changes tail bit-for-bit."""
    from embulk_executor_mapreduce_spark.sinks.changes import (
        CHANGE_TYPE_COL,
        table_changes,
    )

    up = _upstream(spark, tmp_path)
    state, corpus, ckpt = _paths(tmp_path, "tail")
    run_cdc_image_ingest(
        spark, up, ["img_id"], state, corpus, checkpoint=ckpt
    )
    state2, corpus2, _ = _paths(tmp_path, "direct")
    process = incremental_image_sink(state2, corpus2)
    for v in (1, 2):
        batch = (
            table_changes(spark, up, ["img_id"], v - 1, v, per_version=True)
            .filter(F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage"))
            .select("img_id", "payload")
        )
        process(batch, v)
    assert sorted(map(tuple, read_merge_state(spark, state).collect())) == sorted(
        map(tuple, read_merge_state(spark, state2).collect())
    )
