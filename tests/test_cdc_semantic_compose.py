"""CDC tail × semantic dedup composition (r13, VERDICT r12 item 4): a
table_changes follow-mode feed over an upstream merge-sink table driving the
two-level incremental semantic dedup corpus sink — the production wiring for
continuous training-data ingest — including the retry interleavings the
exactly-once construction must survive."""

from __future__ import annotations

from pyspark.sql import functions as F

from embulk_executor_mapreduce_spark.sinks.writer import (
    read_merge_state,
    write_sink,
)
from embulk_executor_mapreduce_spark.spec import SinkSpec
from embulk_executor_mapreduce_spark.streaming.ingest import (
    incremental_semantic_two_level_sink,
    run_cdc_semantic_ingest,
)

DIM = 8


def _vec(i: int) -> list[float]:
    return [((i * 31 + j * 7) % 13 - 6) / 6.0 for j in range(DIM)]


def _frame(spark, rows, rev):
    return spark.createDataFrame(
        [(i, v, rev) for i, v in rows],
        "vec_id long, embedding array<double>, rev long",
    )


def _upstream(spark, tmp_path):
    """Three committed versions of an upstream embeddings merge table:
    v0 seeds ids 0-9 (never delivered by a from_version=0 tail), v1 inserts
    10-19 with 15 an exact dup of 10 and re-upserts id 3 (update), v2
    inserts 20-24 with 21 an exact dup of 10 (a STATE dup by then)."""
    up = str(tmp_path / "upstream")
    sink = SinkSpec(
        type="parquet",
        path=up,
        mode="merge",
        merge_key=("vec_id",),
        merge_order=("rev",),
        merge_keep_versions=4,
    )
    write_sink(_frame(spark, [(i, _vec(i)) for i in range(10)], 0), sink)
    write_sink(
        _frame(
            spark,
            [(i, _vec(i)) for i in range(10, 20) if i != 15]
            + [(15, _vec(10)), (3, _vec(103))],
            1,
        ),
        sink,
    )
    write_sink(
        _frame(
            spark,
            [(i, _vec(i)) for i in range(20, 25) if i != 21]
            + [(21, _vec(10))],
            2,
        ),
        sink,
    )
    return up


# near-exact threshold (cos >= 0.99): the synthetic generator is periodic
# mod 13, so several distinct ids share EXACT vectors — those are the
# intended dups; a loose 0.25 threshold would also catch unrelated
# neighbors and empty the later batches
_KW = dict(coarse_k=2, sub_k=2, iters=1, threshold_micro=990_000)


def _paths(tmp_path, name):
    return (
        str(tmp_path / name / "state"),
        str(tmp_path / name / "corpus"),
        str(tmp_path / name / "cents"),
        str(tmp_path / name / "ckpt"),
    )


def test_cdc_feed_drives_semantic_dedup_e2e(spark, tmp_path):
    up = _upstream(spark, tmp_path)
    state, corpus, cents, ckpt = _paths(tmp_path, "run")
    last = run_cdc_semantic_ingest(
        spark, up, ["vec_id"], state, corpus, cents, checkpoint=ckpt, **_KW
    )
    assert last == 2
    b1 = {
        r["vec_id"]
        for r in spark.read.parquet(f"{corpus}/ingest_batch=1").collect()
    }
    b2 = {
        r["vec_id"]
        for r in spark.read.parquet(f"{corpus}/ingest_batch=2").collect()
    }
    # v1: 10-19 insert + the id-3 update_postimage arrive; the exact
    # within-batch dup 15 (== vec of 10) is dropped, min-id survivor kept
    assert 10 in b1 and 15 not in b1 and 3 in b1
    # v2: 21 duplicates vec(10), which is IN the committed state by now —
    # dropped as a state dup; genuinely novel ids survive
    assert 21 not in b2 and 20 in b2
    # state covers every survivor, claim-tagged by version
    st = read_merge_state(spark, state)
    assert set(
        r["claim_batch"] for r in st.select("claim_batch").distinct().collect()
    ) == {1, 2}
    assert {r["vec_id"] for r in st.select("vec_id").collect()} == b1 | b2


def test_cdc_semantic_retry_after_commit_is_idempotent(spark, tmp_path):
    """The subtle interleaving: version v's state merge COMMITTED but the
    checkpoint advance was lost — redelivery of v must reconstruct the
    pre-batch state view via the claim filter and converge bit-for-bit
    (corpus dir AND state), not drop the batch as all-duplicate."""
    up = _upstream(spark, tmp_path)
    state, corpus, cents, ckpt = _paths(tmp_path, "retry")
    run_cdc_semantic_ingest(
        spark, up, ["vec_id"], state, corpus, cents, checkpoint=ckpt,
        to_version=1, **_KW,
    )
    corpus_before = sorted(
        map(tuple, spark.read.parquet(f"{corpus}/ingest_batch=1").collect())
    )
    state_before = sorted(
        map(
            tuple,
            read_merge_state(spark, state)
            .select("vec_id", "cell", "scid", "claim_batch")
            .collect(),
        )
    )
    # simulate the redelivery: wipe the checkpoint and tail version 1 again
    import os

    os.remove(os.path.join(ckpt, "offset.json"))
    run_cdc_semantic_ingest(
        spark, up, ["vec_id"], state, corpus, cents, checkpoint=ckpt,
        to_version=1, **_KW,
    )
    assert corpus_before == sorted(
        map(tuple, spark.read.parquet(f"{corpus}/ingest_batch=1").collect())
    )
    assert state_before == sorted(
        map(
            tuple,
            read_merge_state(spark, state)
            .select("vec_id", "cell", "scid", "claim_batch")
            .collect(),
        )
    )


def test_cdc_semantic_checkpoint_resume(spark, tmp_path):
    """A bounded first pass (to_version=1) + a later unbounded pass resumes
    from the checkpoint and applies only version 2; an idle third pass
    applies nothing (no new state version, same corpus dirs)."""
    up = _upstream(spark, tmp_path)
    state, corpus, cents, ckpt = _paths(tmp_path, "resume")
    assert run_cdc_semantic_ingest(
        spark, up, ["vec_id"], state, corpus, cents, checkpoint=ckpt,
        to_version=1, **_KW,
    ) == 1
    import os

    assert not os.path.isdir(f"{corpus}/ingest_batch=2")
    assert run_cdc_semantic_ingest(
        spark, up, ["vec_id"], state, corpus, cents, checkpoint=ckpt, **_KW
    ) == 2
    assert os.path.isdir(f"{corpus}/ingest_batch=2")
    st_versions = sorted(os.listdir(os.path.join(state, "_trees")))
    assert run_cdc_semantic_ingest(
        spark, up, ["vec_id"], state, corpus, cents, checkpoint=ckpt, **_KW
    ) == 2
    assert sorted(os.listdir(os.path.join(state, "_trees"))) == st_versions


def test_cdc_semantic_direct_process_matches_tail(spark, tmp_path):
    """The tail is exactly the foreachBatch body driven by versions: feeding
    the same per-version increments straight into
    incremental_semantic_two_level_sink produces identical corpus + state."""
    from embulk_executor_mapreduce_spark.sinks.changes import table_changes

    up = _upstream(spark, tmp_path)
    s_a, c_a, ce_a, ck_a = _paths(tmp_path, "a")
    run_cdc_semantic_ingest(
        spark, up, ["vec_id"], s_a, c_a, ce_a, checkpoint=ck_a, **_KW
    )
    s_b, c_b, ce_b, _ = _paths(tmp_path, "b")
    process = incremental_semantic_two_level_sink(s_b, c_b, ce_b, **_KW)
    for v in (1, 2):
        inc = table_changes(spark, up, ["vec_id"], v - 1, v, per_version=True)
        process(
            inc.filter(
                F.col("_change_type").isin("insert", "update_postimage")
            ).select("vec_id", "embedding"),
            v,
        )
    for sub in ("ingest_batch=1", "ingest_batch=2"):
        assert sorted(
            map(tuple, spark.read.parquet(f"{c_a}/{sub}").collect())
        ) == sorted(map(tuple, spark.read.parquet(f"{c_b}/{sub}").collect()))
    cols = ["vec_id", "cell", "scid", "claim_batch"]
    assert sorted(
        map(tuple, read_merge_state(spark, s_a).select(*cols).collect())
    ) == sorted(map(tuple, read_merge_state(spark, s_b).select(*cols).collect()))


def test_cdc_ann_index_ingest_retry_is_idempotent(spark, tmp_path):
    """The ANN sibling (r13): redelivery of a version whose index merge
    committed converges bit-for-bit — assignment is deterministic against
    the frozen artifacts, so the (cand_id, s) upsert needs no claim — and
    the artifacts are trained exactly once (first delivered increment)."""
    import os

    from embulk_executor_mapreduce_spark.streaming.ingest import (
        run_cdc_ann_index_ingest,
    )

    up = _upstream(spark, tmp_path)
    root = str(tmp_path / "ann")
    ckpt = str(tmp_path / "ann_ckpt")
    kw = dict(n_centroids=4, n_sub=2, sub_dim=4, n_codes=4)
    assert run_cdc_ann_index_ingest(
        spark, up, ["vec_id"], root, checkpoint=ckpt, **kw
    ) == 2
    cents_before = sorted(
        map(tuple, spark.read.parquet(f"{root}/centroids").collect())
    )
    idx_before = sorted(
        map(
            tuple,
            read_merge_state(spark, f"{root}/index")
            .select("cand_id", "cid", "s", "code")
            .collect(),
        )
    )
    # every delivered vector is indexed: v1 (10-19 + the id-3 update) and
    # v2 (20-24), n_sub rows each
    assert {t[0] for t in idx_before} == set(range(10, 25)) | {3}
    os.remove(os.path.join(ckpt, "offset.json"))  # lose the checkpoint
    assert run_cdc_ann_index_ingest(
        spark, up, ["vec_id"], root, checkpoint=ckpt, **kw
    ) == 2
    assert cents_before == sorted(
        map(tuple, spark.read.parquet(f"{root}/centroids").collect())
    )
    assert idx_before == sorted(
        map(
            tuple,
            read_merge_state(spark, f"{root}/index")
            .select("cand_id", "cid", "s", "code")
            .collect(),
        )
    )


def test_cdc_ann_update_reassignment_wins(spark, tmp_path):
    """r13 review finding: index upserts order by the monotone
    _ingest_version, so an upstream UPDATE's re-assigned codes replace the
    stale ones even when the new code numbers sort LOWER than the old
    (ordering by `code` kept whichever sorted higher)."""
    from embulk_executor_mapreduce_spark.operators.similarity import (
        ivf_pq_index_assign,
    )
    from embulk_executor_mapreduce_spark.streaming.ingest import (
        run_cdc_ann_index_ingest,
    )

    up = str(tmp_path / "up")
    sink = SinkSpec(
        type="parquet",
        path=up,
        mode="merge",
        merge_key=("vec_id",),
        merge_order=("rev",),
        merge_keep_versions=4,
    )
    write_sink(_frame(spark, [], 0), sink)  # v0 bootstrap
    write_sink(_frame(spark, [(i, _vec(i)) for i in range(10, 20)], 1), sink)
    kw = dict(n_centroids=4, n_sub=2, sub_dim=4, n_codes=4)
    akw = dict(n_sub=2, sub_dim=4)
    root = str(tmp_path / "ann")
    run_cdc_ann_index_ingest(
        spark, up, ["vec_id"], root, checkpoint=str(tmp_path / "ck"), **kw
    )
    cents = spark.read.parquet(f"{root}/centroids")
    cb = spark.read.parquet(f"{root}/codebook")

    def codes_of(vec):
        rows = ivf_pq_index_assign(
            _frame(spark, [(13, vec)], 9).select("vec_id", "embedding"),
            cents, cb, **akw,
        ).collect()
        return sorted((r["s"], r["cid"], r["code"]) for r in rows)

    old_codes = codes_of(_vec(13))
    # find an update vector whose assignment differs AND has at least one
    # subspace where the new code sorts BELOW the old (the case the old
    # merge_order got wrong); the generator is varied enough that one of
    # the first few candidates qualifies
    new_vec = None
    for cand in range(100, 140):
        nc = codes_of(_vec(cand))
        if nc != old_codes and any(
            n[2] < o[2] for n, o in zip(nc, old_codes)
        ):
            new_vec, new_codes = _vec(cand), nc
            break
    assert new_vec is not None, "no qualifying update vector found"
    write_sink(_frame(spark, [(13, new_vec)], 2), sink)  # upstream UPDATE
    run_cdc_ann_index_ingest(
        spark, up, ["vec_id"], root, checkpoint=str(tmp_path / "ck"), **kw
    )
    got = sorted(
        (r["s"], r["cid"], r["code"])
        for r in read_merge_state(spark, f"{root}/index")
        .filter(F.col("cand_id") == 13)
        .collect()
    )
    assert got == new_codes and got != old_codes


def test_cdc_ann_empty_first_increment_defers_training(spark, tmp_path):
    """r13 review finding: an EMPTY first increment (a no-op re-commit
    diffs to zero change rows) must neither train empty artifacts nor
    create a no-op index version — training waits for the first non-empty
    increment and the checkpoint still advances."""
    import os

    from embulk_executor_mapreduce_spark.streaming.ingest import (
        run_cdc_ann_index_ingest,
    )

    up = str(tmp_path / "up")
    sink = SinkSpec(
        type="parquet",
        path=up,
        mode="merge",
        merge_key=("vec_id",),
        merge_order=("rev",),
        merge_keep_versions=4,
    )
    seed = [(i, _vec(i)) for i in range(10)]
    write_sink(_frame(spark, seed, 0), sink)  # v0 (never delivered)
    write_sink(_frame(spark, seed, 0), sink)  # v1: no-op → empty diff
    kw = dict(n_centroids=4, n_sub=2, sub_dim=4, n_codes=4)
    root = str(tmp_path / "ann")
    ck = str(tmp_path / "ck")
    assert run_cdc_ann_index_ingest(
        spark, up, ["vec_id"], root, checkpoint=ck, to_version=1, **kw
    ) == 1
    assert not os.path.exists(f"{root}/centroids")
    assert not os.path.exists(f"{root}/index")
    write_sink(_frame(spark, [(i, _vec(i)) for i in range(20, 30)], 2), sink)
    assert run_cdc_ann_index_ingest(
        spark, up, ["vec_id"], root, checkpoint=ck, **kw
    ) == 2
    # artifacts trained on the FIRST NON-EMPTY increment (v2's ids)
    assert {
        r["cid"] for r in spark.read.parquet(f"{root}/centroids").collect()
    } == set(range(20, 24))
    assert {
        r["cand_id"]
        for r in read_merge_state(spark, f"{root}/index").collect()
    } == set(range(20, 30))


def test_cdc_semantic_empty_first_increment_defers_training(spark, tmp_path):
    """r14 advisor finding (the semantic twin of the ANN guard): an EMPTY
    first increment (no-op re-commit → zero change rows) must not train
    the coarse/sub centroid pair on the empty batch — which would persist
    empty centroids and silently drop EVERY later version's content — and
    an empty increment after training must not bump a no-op state version;
    the checkpoint still advances in both cases."""
    import os

    up = str(tmp_path / "up")
    sink = SinkSpec(
        type="parquet",
        path=up,
        mode="merge",
        merge_key=("vec_id",),
        merge_order=("rev",),
        merge_keep_versions=6,
    )
    seed = [(i, _vec(i)) for i in range(10)]
    write_sink(_frame(spark, seed, 0), sink)  # v0 (never delivered)
    write_sink(_frame(spark, seed, 0), sink)  # v1: no-op → empty diff
    state, corpus, cents, ckpt = _paths(tmp_path, "empty_first")
    assert run_cdc_semantic_ingest(
        spark, up, ["vec_id"], state, corpus, cents, checkpoint=ckpt,
        to_version=1, **_KW,
    ) == 1
    # nothing trained, no corpus dir, no state — checkpoint advanced only
    assert not os.path.exists(f"{cents}/coarse")
    assert not os.path.exists(state)
    assert not os.path.isdir(f"{corpus}/ingest_batch=1")
    # v2 is the first NON-EMPTY increment: trains + processes normally
    write_sink(_frame(spark, [(i, _vec(i)) for i in range(20, 30)], 2), sink)
    assert run_cdc_semantic_ingest(
        spark, up, ["vec_id"], state, corpus, cents, checkpoint=ckpt, **_KW
    ) == 2
    assert os.path.exists(f"{cents}/coarse")
    survivors = {
        r["vec_id"]
        for r in spark.read.parquet(f"{corpus}/ingest_batch=2").collect()
    }
    assert survivors and survivors <= set(range(20, 30))
    # v3: another no-op — trained state must gain NO new merge version
    write_sink(_frame(spark, [(25, _vec(25))], 2), sink)  # identical row
    st_versions = sorted(os.listdir(os.path.join(state, "_trees")))
    assert run_cdc_semantic_ingest(
        spark, up, ["vec_id"], state, corpus, cents, checkpoint=ckpt, **_KW
    ) == 3
    assert sorted(os.listdir(os.path.join(state, "_trees"))) == st_versions
    assert not os.path.isdir(f"{corpus}/ingest_batch=3")


def test_artifacts_ready_requires_commit_marker(spark, tmp_path):
    """r14 advisor finding: a bare directory is not a committed artifact —
    a crash during the FIRST state merge (dir created, no _CURRENT yet) or
    mid-way through a plain parquet write (no _SUCCESS yet) must probe as
    ABSENT so the retry rebuilds deterministically, instead of failing
    permanently on read. Committed artifacts of both kinds probe present."""
    import os

    from embulk_executor_mapreduce_spark.streaming.ingest import (
        _artifacts_ready,
    )

    missing = str(tmp_path / "nope")
    assert not _artifacts_ready(missing)

    half_state = tmp_path / "half_state"  # mid-first-merge crash shape
    (half_state / "_trees").mkdir(parents=True)
    assert not _artifacts_ready(str(half_state))

    half_parquet = tmp_path / "half_parquet"  # mid-write crash shape
    (half_parquet / "_temporary").mkdir(parents=True)
    (half_parquet / "part-00000.parquet").write_bytes(b"PAR1")
    assert not _artifacts_ready(str(half_parquet))

    committed_parquet = str(tmp_path / "ok_parquet")
    spark.range(3).write.parquet(committed_parquet)
    assert os.path.exists(os.path.join(committed_parquet, "_SUCCESS"))
    assert _artifacts_ready(committed_parquet)

    committed_state = str(tmp_path / "ok_state")
    write_sink(
        _frame(spark, [(1, _vec(1))], 0),
        SinkSpec(
            type="parquet",
            path=committed_state,
            mode="merge",
            merge_key=("vec_id",),
            merge_order=("rev",),
        ),
    )
    assert _artifacts_ready(committed_state)
    # all-of semantics: one uncommitted path poisons the set
    assert not _artifacts_ready(committed_state, str(half_state))


def test_tail_corrupt_checkpoint_names_file(spark, tmp_path):
    """A present-but-unreadable checkpoint is config-class: resuming
    silently from from_version would reprocess delivered versions, so the
    shared tail names the file and stops (shared by BOTH compositions —
    one protocol, one behavior)."""
    import os

    import pytest

    from embulk_executor_mapreduce_spark.errors import ConfigError
    from embulk_executor_mapreduce_spark.streaming.ingest import (
        run_cdc_ann_index_ingest,
        run_cdc_semantic_ingest,
    )

    up = _upstream(spark, tmp_path)
    ck = tmp_path / "ck"
    ck.mkdir()
    (ck / "offset.json").write_text("{not json")
    with pytest.raises(ConfigError, match="offset.json"):
        run_cdc_ann_index_ingest(
            spark, up, ["vec_id"], str(tmp_path / "a"), checkpoint=str(ck)
        )
    with pytest.raises(ConfigError, match="offset.json"):
        run_cdc_semantic_ingest(
            spark, up, ["vec_id"], str(tmp_path / "s1"), str(tmp_path / "s2"),
            str(tmp_path / "s3"), checkpoint=str(ck),
        )


def test_tail_missing_pointer_is_config_error(spark, tmp_path):
    import pytest

    from embulk_executor_mapreduce_spark.errors import ConfigError
    from embulk_executor_mapreduce_spark.streaming.ingest import (
        run_cdc_ann_index_ingest,
    )

    not_a_state = tmp_path / "plain"
    not_a_state.mkdir()
    with pytest.raises(ConfigError, match="version pointer"):
        run_cdc_ann_index_ingest(
            spark, str(not_a_state), ["vec_id"], str(tmp_path / "x")
        )
