"""CDC change feed over the merge sink (sinks/changes.py): snapshot-diff
classification (incl. deletes and NULL transitions the catalog query can't
exercise — the merge sink never deletes), changed-bucket pruning proven via
the files the diff actually reads, and the retention/legacy error paths."""

from __future__ import annotations

import tempfile

import pytest

from embulk_executor_mapreduce_spark.sinks.changes import (
    snapshot_diff,
    table_changes,
)
from embulk_executor_mapreduce_spark.sinks.writer import write_sink
from embulk_executor_mapreduce_spark.spec import SinkSpec


def _rows(df):
    return sorted(
        (tuple(r[c] for c in sorted(df.columns))) for r in df.collect()
    )


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k bigint, s string, x bigint",
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 updated, 3 deleted, 4 NULL→value update, 5 inserted
        [(1, "a", 10), (2, "B", 20), (4, "now", 40), (5, "e", 50)],
        "k bigint, s string, x bigint",
    )
    got = {
        (r.k, r._change_type): (r.s, r.x)
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        (2, "update_preimage"): ("b", 20),
        (2, "update_postimage"): ("B", 20),
        (3, "delete"): ("c", 30),
        (4, "update_preimage"): (None, 40),
        (4, "update_postimage"): ("now", 40),
        (5, "insert"): ("e", 50),
    }


def test_snapshot_diff_value_to_null_is_update(spark):
    old = spark.createDataFrame([(1, "x")], "k bigint, s string")
    new = spark.createDataFrame([(1, None)], "k bigint, s string")
    types = sorted(r._change_type for r in snapshot_diff(old, new, ["k"]).collect())
    assert types == ["update_postimage", "update_preimage"]


def test_snapshot_diff_null_keys(spark):
    """NULL-keyed rows (which the merge sink accepts — groupBy/xxhash64
    both handle NULL keys) must classify by PRESENCE markers, not key
    nullability: identical NULL-keyed rows emit nothing, a NULL-keyed row
    only in `old` is a delete, and a changed one is a pre/post pair."""
    old = spark.createDataFrame(
        [(None, "same", 1), (None, "gone", 2), (1, "a", 3)],
        "k bigint, s string, x bigint",
    )
    new = spark.createDataFrame(
        [(None, "same", 1), (1, "A", 3)], "k bigint, s string, x bigint"
    )
    # NULL keys under eqNullSafe join: the two old NULL rows each match the
    # one new NULL row; (same,1)x(same,1) is identical → no emit, while
    # (gone,2)x(same,1) differs → update pair. The (1,...) row updates too.
    got = sorted(
        (
            (r.k, r._change_type, r.s, r.x)
            for r in snapshot_diff(old, new, ["k"]).collect()
        ),
        key=lambda t: (t[0] is not None, t[0] or 0, t[1]),
    )
    assert (None, "insert", "same", 1) not in got  # the r6 spurious insert
    assert got == [
        (None, "update_postimage", "same", 1),
        (None, "update_preimage", "gone", 2),
        (1, "update_postimage", "A", 3),
        (1, "update_preimage", "a", 3),
    ]


def test_snapshot_diff_null_key_delete(spark):
    old = spark.createDataFrame([(None, "only-old")], "k bigint, s string")
    new = spark.createDataFrame([], "k bigint, s string")
    rows = snapshot_diff(old, new, ["k"]).collect()
    assert [(r.k, r._change_type, r.s) for r in rows] == [
        (None, "delete", "only-old")
    ]


def test_snapshot_diff_marker_collision_raises(spark):
    df = spark.createDataFrame([(1, True)], "k bigint, __cdc_in_o boolean")
    with pytest.raises(ValueError, match="collide"):
        snapshot_diff(df, df, ["k"])


def test_snapshot_diff_matches_python_reference_property(spark):
    """Property pin for the classifier over random keyed snapshots —
    including NULL keys (eqNullSafe join semantics), NULL values, and
    DELETES, which the merge-sink-backed tests can never produce (the sink
    only upserts). Reference: a plain-Python dict diff."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    kv = st.dictionaries(
        st.one_of(st.none(), st.integers(0, 9)),
        st.one_of(st.none(), st.integers(0, 5)),
        max_size=8,
    )

    def mk(d):
        rows = [(k, v) for k, v in d.items()]
        return spark.createDataFrame(rows, schema="k int, v int")

    @settings(max_examples=20, deadline=None)
    @given(old=kv, new=kv)
    def check(old, new):
        got = Counter(
            (r.k, r.v, r._change_type)
            for r in snapshot_diff(mk(old), mk(new), ["k"]).collect()
        )
        want = Counter()
        for k in set(old) | set(new):
            if k not in old:
                want[(k, new[k], "insert")] += 1
            elif k not in new:
                want[(k, old[k], "delete")] += 1
            elif old[k] != new[k]:
                want[(k, old[k], "update_preimage")] += 1
                want[(k, new[k], "update_postimage")] += 1
        assert got == want, (old, new)

    check()


def test_snapshot_diff_identical_is_empty(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, s string")
    assert snapshot_diff(df, df, ["k"]).count() == 0


def test_snapshot_diff_schema_mismatch_raises(spark):
    a = spark.createDataFrame([(1, "a")], "k bigint, s string")
    b = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="schemas differ"):
        snapshot_diff(a, b, ["k"])


@pytest.fixture()
def state(spark):
    path = tempfile.mkdtemp(prefix="tc_state_") + "/state"
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("o",),
        merge_buckets=8,
    )
    base = spark.createDataFrame(
        [(k, 1, f"v{k}") for k in range(16)], "k bigint, o int, s string"
    )
    write_sink(base, sink)  # v0: all 8 buckets
    inc = spark.createDataFrame([(3, 2, "CHANGED")], "k bigint, o int, s string")
    write_sink(inc, sink)  # v1: exactly one bucket rewritten
    return path


def test_table_changes_end_to_end_and_bucket_pruning(spark, state):
    diff = table_changes(spark, state, ["k"], from_version=0, to_version=1)
    rows = {(r.k, r._change_type): (r.o, r.s) for r in diff.collect()}
    assert rows == {
        (3, "update_preimage"): (1, "v3"),
        (3, "update_postimage"): (2, "CHANGED"),
    }
    # pruning proof: the diff's scan lists files from exactly 2 bucket dirs
    # (the changed bucket in v0 and in v1), not the 16 dirs of 2 snapshots
    dirs = {f.rsplit("/", 1)[0] for f in diff.inputFiles()}
    assert len(dirs) == 2, dirs
    assert all("__mbd=" in d for d in dirs)
    # one dir from each version tree
    assert {d.split("_trees/")[1].split("/")[0] for d in dirs} == {"v0", "v1"}


def test_table_changes_one_sided_diff_probes_one_bucket(spark):
    """An increment that only ADDS a bucket leaves old_dirs empty; the
    empty side must take its schema from ONE bucket dir of the other
    version, not list every committed bucket (the r6 `(bt or bf).values()`
    probe defeated pruning for first-version/empty-side diffs)."""
    from pyspark.sql import functions as F

    # pick two keys landing in different buckets under the sink's layout
    ks = (
        spark.range(20)
        .withColumn("b", F.pmod(F.xxhash64("id"), F.lit(2)))
        .collect()
    )
    by_bucket = {}
    for r in ks:
        by_bucket.setdefault(r.b, r.id)
    ka, kb = sorted(by_bucket.values())
    path = tempfile.mkdtemp(prefix="tc_oneside_") + "/state"
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("o",),
        merge_buckets=2,
    )
    write_sink(
        spark.createDataFrame([(ka, 1, "a")], "k bigint, o int, s string"), sink
    )
    write_sink(
        spark.createDataFrame([(kb, 1, "b")], "k bigint, o int, s string"), sink
    )
    diff = table_changes(spark, path, ["k"], from_version=0, to_version=1)
    assert [(r.k, r._change_type, r.s) for r in diff.collect()] == [
        (kb, "insert", "b")
    ]
    # scan surface: the added bucket in v1 plus at most one schema-probe dir
    dirs = {f.rsplit("/", 1)[0] for f in diff.inputFiles()}
    assert len(dirs) <= 2, dirs


def test_table_changes_default_to_version_is_current(spark, state):
    diff = table_changes(spark, state, ["k"], from_version=0)
    assert diff.count() == 2


def test_table_changes_same_version_is_empty(spark, state):
    assert table_changes(spark, state, ["k"], 1, 1).count() == 0


def test_table_changes_error_paths(spark, state):
    with pytest.raises(ValueError, match="from_version"):
        table_changes(spark, state, ["k"], 1, 0)
    with pytest.raises(FileNotFoundError, match="merge_keep_versions"):
        table_changes(spark, state, ["k"], 0, 99)
    with pytest.raises(FileNotFoundError, match="legacy"):
        table_changes(spark, tempfile.mkdtemp(prefix="tc_nostate_"), ["k"], 0)


@pytest.fixture()
def state3(spark):
    """3-commit state with a byte-identical revert: v1 changes k=3 and
    inserts k=100; v2 reverts k=3 to its v0 row (constant merge_order —
    incoming wins ties) and changes k=5."""
    path = tempfile.mkdtemp(prefix="tc_state3_") + "/state"
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("o",),
        merge_buckets=8,
        merge_keep_versions=3,
    )
    base = spark.createDataFrame(
        [(k, 0, f"v{k}") for k in range(16)], "k bigint, o int, s string"
    )
    write_sink(base, sink)  # v0
    write_sink(
        spark.createDataFrame(
            [(3, 0, "CHANGED"), (100, 0, "NEW")], "k bigint, o int, s string"
        ),
        sink,
    )  # v1
    write_sink(
        spark.createDataFrame(
            [(3, 0, "v3"), (5, 0, "ALSO")], "k bigint, o int, s string"
        ),
        sink,
    )  # v2: k=3 reverted byte-identically
    return path


def test_table_changes_per_version_vs_net(spark, state3):
    """VERDICT r8 item 3: per_version=True emits adjacent-pair diffs tagged
    _commit_version; a commit-then-revert key appears per commit but
    vanishes from the net endpoint feed."""
    per = table_changes(
        spark, state3, ["k"], from_version=0, to_version=2, per_version=True
    )
    rows = {
        (r.k, r._commit_version, r._change_type): r.s for r in per.collect()
    }
    assert rows == {
        (3, 1, "update_preimage"): "v3",
        (3, 1, "update_postimage"): "CHANGED",
        (100, 1, "insert"): "NEW",
        (3, 2, "update_preimage"): "CHANGED",
        (3, 2, "update_postimage"): "v3",
        (5, 2, "update_preimage"): "v5",
        (5, 2, "update_postimage"): "ALSO",
    }
    net = table_changes(spark, state3, ["k"], from_version=0, to_version=2)
    net_rows = {(r.k, r._change_type) for r in net.collect()}
    # the reverted key 3 is invisible net; no commit attribution column
    assert net_rows == {
        (100, "insert"),
        (5, "update_preimage"),
        (5, "update_postimage"),
    }
    assert "_commit_version" not in net.columns


def test_table_changes_per_version_same_version_empty_with_schema(
    spark, state3
):
    empty = table_changes(
        spark, state3, ["k"], from_version=1, to_version=1, per_version=True
    )
    assert empty.count() == 0
    assert empty.columns == ["k", "o", "s", "_change_type", "_commit_version"]


def test_cdc_per_version_reconstructs_every_snapshot(spark, tmp_path):
    """Algebraic invariant over a randomized commit sequence: applying the
    per-version feed's inserts + update_postimages for commit v on top of
    snapshot v-1 reproduces snapshot v EXACTLY, for every v in the range —
    i.e. the feed is a complete, correctly-attributed replay log. Preimages
    must equal the prior snapshot's row for their key."""
    import random

    rng = random.Random(20260815)
    path = str(tmp_path / "state")
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("o",),
        merge_buckets=8,
        merge_keep_versions=5,
    )
    model: dict[int, str] = {}
    snapshots = []
    for v in range(4):
        keys = rng.sample(range(31), rng.randint(1, 12))
        batch = [(k, 0, f"v{v}_{k}") for k in keys]
        write_sink(
            spark.createDataFrame(batch, "k bigint, o int, s string"), sink
        )
        for k, _, s in batch:
            model[k] = s
        snapshots.append(dict(model))

    rows = table_changes(
        spark, path, ["k"], from_version=0, to_version=3, per_version=True
    ).collect()
    state = dict(snapshots[0])
    for v in (1, 2, 3):
        for r in rows:
            if r._commit_version == v and r._change_type in (
                "insert",
                "update_postimage",
            ):
                state[r.k] = r.s
        assert state == snapshots[v], v
    for r in rows:
        if r._change_type == "update_preimage":
            assert snapshots[r._commit_version - 1][r.k] == r.s
        if r._change_type == "insert":
            assert r.k not in snapshots[r._commit_version - 1]


def test_table_changes_per_version_schema_on_read_pinned(spark, tmp_path):
    """r9 review fix (second cycle): under a schema-on-read format the feed
    schema is inferred ONCE over the full newest-with-buckets snapshot —
    (a) per-pair inference would type the same column differently across
    pairs (all-null buckets vs populated, '42' alone reads as bigint) and
    break the union; (b) a single-bucket probe is just as unsound, since a
    json bucket all-null in a column writes no field for it and the pinned
    schema would DROP the column feed-wide."""
    path = str(tmp_path / "state")
    sink = SinkSpec(
        type="json",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("o",),
        merge_buckets=4,
        merge_keep_versions=4,
    )
    write_sink(
        spark.createDataFrame(
            [(1, 0, None), (2, 0, None)], "k bigint, o int, s string"
        ),
        sink,
    )  # v0: s all-null everywhere
    write_sink(
        spark.createDataFrame([(3, 0, "hello")], "k bigint, o int, s string"),
        sink,
    )  # v1
    write_sink(
        spark.createDataFrame([(1, 0, "42")], "k bigint, o int, s string"),
        sink,
    )  # v2: numeric-looking string — pair-alone inference would say bigint
    feed = table_changes(
        spark, path, ["k"], from_version=0, to_version=2, fmt="json",
        per_version=True,
    )
    assert dict(feed.dtypes)["s"] == "string"
    rows = sorted(
        (r.k, r._commit_version, r._change_type, r.s) for r in feed.collect()
    )
    assert rows == [
        (1, 2, "update_postimage", "42"),
        (1, 2, "update_preimage", None),
        (3, 1, "insert", "hello"),
    ]
    # net mode shares the pin: the old side's changed buckets are all-null
    # in s (no field written), the new side's carry '42' — independent
    # per-side inference would drop/retype s and trip the schema check
    net = table_changes(spark, path, ["k"], from_version=0, to_version=2, fmt="json")
    assert dict(net.dtypes)["s"] == "string"
    net_rows = sorted(
        (r.k, r._change_type, r.s) for r in net.collect()
    )
    assert net_rows == [
        (1, "update_postimage", "42"),
        (1, "update_preimage", None),
        (3, "insert", "hello"),
    ]


def test_table_changes_per_version_needs_full_range(spark):
    """Default retention (keep 2) GCs v0 by v2: the per-version feed must
    refuse with the retention hint rather than silently skip a commit."""
    path = tempfile.mkdtemp(prefix="tc_gc_") + "/state"
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("o",),
        merge_buckets=4,
    )
    for tag in ("a", "b", "c"):
        write_sink(
            spark.createDataFrame([(1, 0, tag)], "k bigint, o int, s string"),
            sink,
        )
    with pytest.raises(FileNotFoundError, match="per_version"):
        table_changes(
            spark, path, ["k"], from_version=0, to_version=2, per_version=True
        )
    # the surviving adjacent pair still works
    ok = table_changes(
        spark, path, ["k"], from_version=1, to_version=2, per_version=True
    )
    assert {(r.k, r._commit_version, r._change_type, r.s) for r in ok.collect()} == {
        (1, 2, "update_preimage", "b"),
        (1, 2, "update_postimage", "c"),
    }


# ---------------------------------------------------------------------------
# Persisted per-commit change files (VERDICT r9 item 3 — Delta CDF parity)
# ---------------------------------------------------------------------------

from embulk_executor_mapreduce_spark.sinks.changes import (  # noqa: E402
    changelog_versions,
    materialize_changes,
)


def test_materialize_changes_bit_equality_and_idempotence(spark, state3):
    """The persisted feed must equal the pair-diff recompute bit for bit
    (the recompute path IS the oracle), and a second materialize call is a
    no-op."""
    assert materialize_changes(spark, state3, ["k"]) == [1, 2]
    assert materialize_changes(spark, state3, ["k"]) == []
    assert changelog_versions(state3) == [1, 2]
    persisted = table_changes(
        spark, state3, ["k"], 0, 2, per_version=True, use_changelog=True
    )
    recomputed = table_changes(
        spark, state3, ["k"], 0, 2, per_version=True, use_changelog=False
    )
    assert persisted.columns == recomputed.columns
    assert dict(persisted.dtypes) == dict(recomputed.dtypes)
    assert _rows(persisted) == _rows(recomputed)
    assert dict(persisted.dtypes)["_commit_version"] == "bigint"  # ADVICE r9


def test_changelog_read_is_pure_scan_auto_selected(spark, state3):
    """Full coverage → the default (auto) read serves from the changelog:
    zero joins in the plan, and every scanned file lives under
    _changelog/ (never a snapshot tree)."""
    materialize_changes(spark, state3, ["k"])
    feed = table_changes(spark, state3, ["k"], 0, 2, per_version=True)
    plan = feed._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    files = feed.inputFiles()
    assert files and all("/_changelog/" in f for f in files), files
    # a partial range is served persisted too, pruned to its commits
    one = table_changes(spark, state3, ["k"], 1, 2, per_version=True)
    assert all("/_changelog/v2/" in f for f in one.inputFiles())


def test_use_changelog_true_without_files_raises_with_hint(spark, state3):
    with pytest.raises(FileNotFoundError, match="materialize_changes"):
        table_changes(
            spark, state3, ["k"], 0, 2, per_version=True, use_changelog=True
        )
    # partial coverage is never mixed: one missing commit → recompute
    materialize_changes(spark, state3, ["k"], through_version=1)
    feed = table_changes(spark, state3, ["k"], 0, 2, per_version=True)
    assert not any("/_changelog/" in f for f in feed.inputFiles())


def test_changelog_keys_mismatch_raises(spark, state3):
    materialize_changes(spark, state3, ["k"])
    with pytest.raises(ValueError, match="materialized with"):
        table_changes(
            spark, state3, ["k", "o"], 0, 2, per_version=True,
            use_changelog=True,
        )


def test_use_changelog_requires_per_version(spark, state3):
    with pytest.raises(ValueError, match="per_version"):
        table_changes(spark, state3, ["k"], 0, 2, use_changelog=True)


def test_changelog_outlives_snapshot_retention(spark):
    """A materialized commit stays readable after its snapshots age out of
    merge retention — the capability recompute cannot offer (and the reason
    the per-version feed over a GC'd range works only via the changelog)."""
    path = tempfile.mkdtemp(prefix="tc_outlive_") + "/state"
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("o",),
        merge_buckets=4,
    )
    for i, tag in enumerate(("a", "b", "c")):
        write_sink(
            spark.createDataFrame([(1, 0, tag)], "k bigint, o int, s string"),
            sink,
        )
        materialize_changes(spark, path, ["k"])
    # default keep=2 GC'd v0's manifest at the v2 commit
    import os

    from embulk_executor_mapreduce_spark.sinks.writer import _manifest_path

    assert not os.path.exists(_manifest_path(path, 0))
    with pytest.raises(FileNotFoundError, match="per_version"):
        table_changes(
            spark, path, ["k"], 0, 2, per_version=True, use_changelog=False
        )
    feed = table_changes(spark, path, ["k"], 0, 2, per_version=True)
    assert {(r.k, r._commit_version, r._change_type, r.s) for r in feed.collect()} == {
        (1, 1, "update_preimage", "a"),
        (1, 1, "update_postimage", "b"),
        (1, 2, "update_preimage", "b"),
        (1, 2, "update_postimage", "c"),
    }


def test_changelog_crash_orphan_rebuilt(spark, state3):
    """A STALE data dir without its json marker is a crash orphan (rename
    landed, marker write didn't): the next materialize must rebuild it
    rather than trust a possibly-partial write. A FRESH unmarked dir is a
    live concurrent materializer inside its rename→marker window and must
    be left alone (r10 review finding 3 — an eager rmtree could delete a
    peer's committed payload and strand its marker)."""
    import os
    import shutil
    import time

    materialize_changes(spark, state3, ["k"])
    from embulk_executor_mapreduce_spark.sinks.changes import (
        _changelog_data_dir,
        _changelog_meta_path,
        _local,
    )

    local = _local(state3)
    os.remove(_changelog_meta_path(local, 2))
    # poison the orphaned data dir to prove it is rebuilt, not reused
    shutil.rmtree(_changelog_data_dir(local, 2))
    os.makedirs(_changelog_data_dir(local, 2))
    assert changelog_versions(state3) == [1]
    # fresh orphan → owned by a live peer → skipped, nothing rebuilt
    assert materialize_changes(spark, state3, ["k"]) == []
    assert changelog_versions(state3) == [1]
    # aged past the staleness bound → crash orphan → rebuilt
    old = time.time() - 7200
    os.utime(_changelog_data_dir(local, 2), (old, old))
    assert materialize_changes(spark, state3, ["k"]) == [2]
    feed = table_changes(
        spark, state3, ["k"], 1, 2, per_version=True, use_changelog=True
    )
    assert feed.count() == 4  # k=3 revert pre+post, k=5 update pre+post


def test_changelog_marker_without_data_repairs_and_reads_degrade(
    spark, state3
):
    """r10 review finding 2: a marker whose data dir was deleted must (a)
    degrade the default-mode read to recompute instead of PATH_NOT_FOUND,
    and (b) be repaired by the next materialize (marker dropped, version
    rebuilt) instead of being skipped forever."""
    import shutil

    from embulk_executor_mapreduce_spark.sinks.changes import (
        _changelog_data_dir,
        _local,
    )

    materialize_changes(spark, state3, ["k"])
    shutil.rmtree(_changelog_data_dir(_local(state3), 2))
    # auto mode: coverage is incomplete → recompute, no error, right rows
    feed = table_changes(spark, state3, ["k"], 0, 2, per_version=True)
    assert not any("/_changelog/" in f for f in feed.inputFiles())
    assert feed.count() == 7
    # strict mode names the missing version
    with pytest.raises(FileNotFoundError, match=r"\[2\]"):
        table_changes(
            spark, state3, ["k"], 0, 2, per_version=True, use_changelog=True
        )
    # materialize repairs: marker dropped, version rebuilt
    assert materialize_changes(spark, state3, ["k"]) == [2]
    assert changelog_versions(state3) == [1, 2]


def test_changelog_keys_mismatch_auto_mode_falls_back(spark, state3):
    """r10 review finding 4: in default (auto) mode a keys mismatch means
    'this changelog is not for this read' — degrade to recompute exactly
    like missing coverage; only use_changelog=True raises."""
    materialize_changes(spark, state3, ["k"])
    feed = table_changes(spark, state3, ["k", "o"], 0, 2, per_version=True)
    assert not any("/_changelog/" in f for f in feed.inputFiles())
    assert feed.count() > 0


def test_changelog_schema_on_read_evolution_not_silently_dropped(
    spark, tmp_path
):
    """r10 review finding 1 (the empirically-confirmed scenario): a json
    merge sink whose column x is all-null through v1 (json omits the
    field) and populated in v2. Each commit's change file pins its own
    snapshot's inferred schema, so v1's file lacks x — the merged
    changelog read must still surface x (NULL for the v1 commit, 'XX' on
    the v2 postimage), matching the range-pinned recompute instead of
    silently dropping the column."""
    path = str(tmp_path / "state")
    sink = SinkSpec(
        type="json",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("o",),
        merge_buckets=4,
        merge_keep_versions=3,
    )
    rows = "k bigint, o int, s string, x string"
    write_sink(
        spark.createDataFrame([(1, 0, "a", None), (2, 0, "b", None)], rows),
        sink,
    )  # v0: x all-null → json writes no x field
    write_sink(spark.createDataFrame([(1, 0, "a2", None)], rows), sink)  # v1
    write_sink(spark.createDataFrame([(2, 0, "b2", "XX")], rows), sink)  # v2

    # materialize incrementally (v1's file pinned before x ever appears)
    assert materialize_changes(spark, path, ["k"], fmt="json") == [1, 2]
    recompute = table_changes(
        spark, path, ["k"], 0, 2, fmt="json", per_version=True,
        use_changelog=False,
    )
    persisted = table_changes(
        spark, path, ["k"], 0, 2, fmt="json", per_version=True,
        use_changelog=True,
    )
    assert sorted(persisted.columns) == sorted(recompute.columns)
    assert _rows(persisted) == _rows(recompute)
    post = {
        (r.k, r._commit_version): r.x
        for r in persisted.collect()
        if r._change_type == "update_postimage"
    }
    assert post == {(1, 1): None, (2, 2): "XX"}


def test_materialize_changes_legacy_state_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="pre-pointer"):
        materialize_changes(spark, str(tmp_path / "nope"), ["k"])


def test_changelog_survives_sink_gc_and_new_commits(spark, tmp_path):
    """The design claim the module docstring makes — the sink GC sweeps
    _trees/ + manifests + known Spark artifacts at the state ROOT and never
    the _changelog/ dir — proven by running real commits past the retention
    bound: materialized change files for GC'd versions remain committed and
    readable while their manifests are gone."""
    import os

    from embulk_executor_mapreduce_spark.sinks.changes import (
        _changelog_data_dir,
        _local,
    )
    from embulk_executor_mapreduce_spark.sinks.writer import _manifest_path

    path = str(tmp_path / "state")
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("o",),
        merge_buckets=4,
    )
    for i, tag in enumerate(("a", "b", "c", "d", "e")):
        write_sink(
            spark.createDataFrame([(1, 0, tag)], "k bigint, o int, s string"),
            sink,
        )
        materialize_changes(spark, path, ["k"])
    # keep=2: only v3/v4 manifests retained; v1..v4 changelogs all committed
    assert changelog_versions(path) == [1, 2, 3, 4]
    for v in (0, 1, 2):
        assert not os.path.exists(_manifest_path(_local(path), v))
    for v in (1, 2, 3, 4):
        assert os.path.isdir(_changelog_data_dir(_local(path), v))
    feed = table_changes(spark, path, ["k"], 0, 4, per_version=True)
    assert [
        (r._commit_version, r._change_type, r.s)
        for r in feed.orderBy("_commit_version", "_change_type").collect()
    ] == [
        (1, "update_postimage", "b"),
        (1, "update_preimage", "a"),
        (2, "update_postimage", "c"),
        (2, "update_preimage", "b"),
        (3, "update_postimage", "d"),
        (3, "update_preimage", "c"),
        (4, "update_postimage", "e"),
        (4, "update_preimage", "d"),
    ]


def test_materialize_changes_concurrent_threads_commit_once(spark, state3):
    """Protocol pin under a REAL race: N threads materialize the same state
    concurrently. Exactly one writer wins each version (the sum of all
    threads' returned version lists is a permutation of [1, 2] with no
    duplicates — os.rename is the arbiter), every loser discards cleanly
    (no .inprogress- residue, no unmarked dirs), and the committed feed is
    bit-identical to the recompute oracle."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    from embulk_executor_mapreduce_spark.sinks.changes import _local

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(
            ex.map(
                lambda _: materialize_changes(spark, state3, ["k"]),
                range(4),
            )
        )
    committed = sorted(v for r in results for v in r)
    assert committed == [1, 2], results  # each version committed exactly once
    cdir = os.path.join(_local(state3), "_changelog")
    leftovers = [n for n in os.listdir(cdir) if n.startswith(".inprogress-")]
    assert leftovers == []
    assert changelog_versions(state3) == [1, 2]
    persisted = table_changes(
        spark, state3, ["k"], 0, 2, per_version=True, use_changelog=True
    )
    recomputed = table_changes(
        spark, state3, ["k"], 0, 2, per_version=True, use_changelog=False
    )
    assert _rows(persisted) == _rows(recomputed)


# ---------------------------------------------------------------------------
# Changelog retention (VERDICT r10 item 4) + auto-mode type-drift degrade
# (ADVICE r10)
# ---------------------------------------------------------------------------

from embulk_executor_mapreduce_spark.sinks.changes import (  # noqa: E402
    expire_changelog,
)


def test_expire_changelog_removes_and_reads_degrade(spark, state3):
    """Expiry removes marker AND data for versions below the cutoff; an
    expired range degrades to recompute in auto mode and raises the
    materialize hint under use_changelog=True; an unexpired suffix range is
    still served persisted. A second expire call is a no-op."""
    import os

    from embulk_executor_mapreduce_spark.sinks.changes import (
        _changelog_data_dir,
        _changelog_meta_path,
        _local,
    )

    materialize_changes(spark, state3, ["k"])
    assert expire_changelog(state3, 2) == [1]
    assert expire_changelog(state3, 2) == []
    local = _local(state3)
    assert not os.path.exists(_changelog_meta_path(local, 1))
    assert not os.path.isdir(_changelog_data_dir(local, 1))
    assert changelog_versions(state3) == [2]
    # auto mode: coverage of (0, 2] is broken → pair-diff recompute
    feed = table_changes(spark, state3, ["k"], 0, 2, per_version=True)
    assert not any("/_changelog/" in f for f in feed.inputFiles())
    assert feed.count() > 0
    # strict mode names the expired commit and the remedy
    with pytest.raises(FileNotFoundError, match=r"\[1\].*materialize_changes"):
        table_changes(
            spark, state3, ["k"], 0, 2, per_version=True, use_changelog=True
        )
    # the surviving suffix range still reads persisted
    tail = table_changes(spark, state3, ["k"], 1, 2, per_version=True)
    assert all("/_changelog/v2/" in f for f in tail.inputFiles())
    # re-materialize repopulates the expired version (manifests retained)
    assert materialize_changes(spark, state3, ["k"]) == [1]


def test_materialize_keep_versions_bounds_changelog(spark, state3):
    """The retention knob on the writer: keep only the newest N committed
    change files — and (r11 review finding 3) only ever BUILD the newest N
    (versions below the cutoff are skipped up front, not built-then-
    expired). A pre-existing older commit below the cutoff is expired.
    Invalid N rejected up front."""
    materialize_changes(spark, state3, ["k"], through_version=1)  # v1 exists
    assert materialize_changes(spark, state3, ["k"], keep_versions=1) == [2]
    assert changelog_versions(state3) == [2]  # v1 expired by the knob
    with pytest.raises(ValueError, match="keep_versions"):
        materialize_changes(spark, state3, ["k"], keep_versions=0)


def test_expire_changelog_sweeps_stale_crash_orphan_data_dir(spark, state3):
    """A crash between expiry's marker removal and its rmtree leaves an
    unmarked data dir below the cutoff; once STALE by mtime the next
    expire call sweeps it. While still FRESH it is left alone (ADVICE
    r11: an unmarked-but-fresh dir may belong to a live materializer
    inside its rename→marker window — expiring it would wedge the peer's
    imminent marker as marker-without-data)."""
    import os
    import time

    from embulk_executor_mapreduce_spark.sinks.changes import (
        _CHANGELOG_STALE_SEC,
        _changelog_data_dir,
        _changelog_meta_path,
        _local,
    )

    materialize_changes(spark, state3, ["k"])
    os.remove(_changelog_meta_path(_local(state3), 1))  # simulated crash
    ddir = _changelog_data_dir(_local(state3), 1)
    # fresh: skipped this pass, dir intact
    assert expire_changelog(state3, 2) == []
    assert os.path.isdir(ddir)
    # stale: swept
    past = time.time() - _CHANGELOG_STALE_SEC - 60
    os.utime(ddir, (past, past))
    assert expire_changelog(state3, 2) == [1]
    assert not os.path.isdir(ddir)


def test_expire_changelog_marked_data_dir_goes_regardless_of_age(spark, state3):
    """A MARKED data dir is a completed commit — normal retention expiry
    removes it immediately even though it was materialized seconds ago."""
    import os

    from embulk_executor_mapreduce_spark.sinks.changes import (
        _changelog_data_dir,
        _local,
    )

    materialize_changes(spark, state3, ["k"])
    assert expire_changelog(state3, 2) == [1]
    assert not os.path.isdir(_changelog_data_dir(_local(state3), 1))


def test_expire_changelog_missing_dir_is_noop(spark, state3):
    assert expire_changelog(state3, 99) == []  # no _changelog/ yet


def test_changelog_type_drift_auto_degrades_strict_fails(spark, tmp_path):
    """ADVICE r10: TYPE-level inference drift across commits (the same
    column long in one commit's file, string in another) makes the merged
    parquet read fail at scan time. Auto mode must detect it from the
    footers and degrade to the recompute path (the default read never
    errors); only use_changelog=True surfaces the loud failure. Drift is
    simulated by rewriting one committed change file with a conflicting
    type — the shape historical csv/json inference drift produces."""
    import shutil

    from pyspark.sql import functions as F

    from embulk_executor_mapreduce_spark.sinks.changes import (
        _changelog_data_dir,
        _local,
    )

    path = str(tmp_path / "state")
    sink = SinkSpec(
        type="json",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("o",),
        merge_buckets=4,
        merge_keep_versions=3,
    )
    rows = "k bigint, o int, s string"
    write_sink(spark.createDataFrame([(1, 0, "a"), (2, 0, "b")], rows), sink)
    write_sink(spark.createDataFrame([(1, 0, "a2")], rows), sink)  # v1
    write_sink(spark.createDataFrame([(2, 0, "b2")], rows), sink)  # v2
    assert materialize_changes(spark, path, ["k"], fmt="json") == [1, 2]

    # rewrite v1's change file with s typed long instead of string
    ddir = _changelog_data_dir(_local(path), 1)
    v1 = spark.read.parquet(ddir).withColumn("s", F.lit(1).cast("long"))
    v1.write.mode("overwrite").parquet(ddir + "_drift")
    shutil.rmtree(ddir)
    shutil.move(ddir + "_drift", ddir)

    feed = table_changes(
        spark, path, ["k"], 0, 2, per_version=True, fmt="json",
        use_changelog=None,
    )
    assert not any("/_changelog/" in f for f in feed.inputFiles())
    assert feed.count() > 0
    with pytest.raises(Exception, match="[Mm]erg|[Ss]chema"):
        table_changes(
            spark, path, ["k"], 0, 2, per_version=True, fmt="json",
            use_changelog=True,
        ).collect()


def test_expire_changelog_is_atomic_per_dir_and_sweeps_asides(spark, state3):
    """r11 review finding 1: expiry renames the data dir aside before the
    recursive delete, so a concurrent reader either sees a whole dir or
    none. A crash-orphaned .expired- aside (simulated) is swept by the
    next materialize once stale."""
    import os
    import time as _time

    from embulk_executor_mapreduce_spark.sinks.changes import (
        _CHANGELOG_EXPIRED,
        _local,
    )

    materialize_changes(spark, state3, ["k"])
    cdir = os.path.join(_local(state3), "_changelog")
    # simulate an expiry crash: aside dir left behind, made stale
    orphan = os.path.join(cdir, f"{_CHANGELOG_EXPIRED}v9-deadbeef")
    os.mkdir(orphan)
    past = _time.time() - 7200
    os.utime(orphan, (past, past))
    assert materialize_changes(spark, state3, ["k"]) == []  # sweep ran
    assert not os.path.isdir(orphan)
    # normal expiry leaves no .expired- residue
    assert expire_changelog(state3, 2) == [1]
    assert not any(_CHANGELOG_EXPIRED in n for n in os.listdir(cdir))


def test_changelog_probe_corrupt_footer_degrades(spark, tmp_path):
    """r11 review finding 2: a corrupt/truncated part file in a committed
    change file makes the footer probe raise ArrowInvalid (not OSError);
    auto mode must still degrade to recompute, never error."""
    import os

    from embulk_executor_mapreduce_spark.sinks.changes import (
        _changelog_data_dir,
        _local,
    )

    path = str(tmp_path / "state")
    sink = SinkSpec(
        type="json",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("o",),
        merge_buckets=4,
        merge_keep_versions=3,
    )
    rows = "k bigint, o int, s string"
    write_sink(spark.createDataFrame([(1, 0, "a")], rows), sink)
    write_sink(spark.createDataFrame([(1, 0, "b")], rows), sink)
    assert materialize_changes(spark, path, ["k"], fmt="json") == [1]
    ddir = _changelog_data_dir(_local(path), 1)
    part = next(
        n for n in os.listdir(ddir)
        if n.startswith("part-") and n.endswith(".parquet")
    )
    with open(os.path.join(ddir, part), "wb") as f:
        f.write(b"not a parquet file")
    feed = table_changes(
        spark, path, ["k"], 0, 1, per_version=True, fmt="json",
        use_changelog=None,
    )
    assert not any("/_changelog/" in f for f in feed.inputFiles())
    assert feed.count() > 0


def test_materialize_keep_versions_skips_below_cutoff(spark, tmp_path):
    """r11 review finding 3: with keep_versions=N a catch-up materialize
    builds only the newest N commits' diffs — versions below the cutoff
    are never built-then-deleted."""
    path = str(tmp_path / "state")
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("o",),
        merge_buckets=4,
        merge_keep_versions=6,
    )
    for i, tag in enumerate(("a", "b", "c", "d", "e")):
        write_sink(
            spark.createDataFrame([(1, 0, tag)], "k bigint, o int, s string"),
            sink,
        )
    # 5 commits retained (v0..v4); keep only the newest 2
    assert materialize_changes(spark, path, ["k"], keep_versions=2) == [3, 4]
    assert changelog_versions(path) == [3, 4]


def test_changelog_lifecycle_churn_property(spark, tmp_path):
    """Post-seal r11 addition: a deterministic churn of the round's whole
    changelog lifecycle — commits interleaved with materialize
    (through_version / keep_versions), expire_changelog, and reads under
    all three provenance modes. Invariants after every step: committed
    changelog versions are a sorted subset of history; the AUTO read of
    any in-retention range is bit-equal to the recompute read (whatever
    mix of persisted/expired files exists); strict mode either raises the
    materialize hint or matches; no scratch residue (.inprogress- /
    .repair- / .expired-) survives a crash-free sequence."""
    import os
    import random

    from embulk_executor_mapreduce_spark.sinks.changes import (
        _local,
        changelog_versions,
        expire_changelog,
        materialize_changes,
    )

    path = str(tmp_path / "state")
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("o",),
        merge_buckets=4,
        merge_keep_versions=9,  # retain everything: reads stay legal
    )
    rng = random.Random(0xC0FFEE)
    current = -1

    def commit():
        nonlocal current
        current += 1
        rows = [
            (k, 0, f"v{current}-{k}")
            for k in range(8)
            if rng.random() < 0.6
        ] or [(0, 0, f"v{current}-forced")]
        write_sink(
            spark.createDataFrame(rows, "k bigint, o int, s string"), sink
        )

    for _ in range(3):
        commit()  # v0..v2

    for step in range(10):
        op = rng.choice(["commit", "mat", "mat_keep", "expire", "read"])
        if op == "commit" and current < 6:
            commit()
        elif op == "mat":
            materialize_changes(
                spark, path, ["k"],
                through_version=rng.randint(1, current),
            )
        elif op == "mat_keep":
            materialize_changes(
                spark, path, ["k"], keep_versions=rng.randint(1, 3)
            )
        elif op == "expire":
            expire_changelog(path, rng.randint(0, current + 1))
        # invariants + a read check every step
        committed = changelog_versions(path)
        assert committed == sorted(set(committed))
        assert all(1 <= v <= current for v in committed)
        lo = rng.randint(0, current - 1)
        hi = rng.randint(lo + 1, current)
        auto = table_changes(spark, path, ["k"], lo, hi, per_version=True)
        recomputed = table_changes(
            spark, path, ["k"], lo, hi, per_version=True,
            use_changelog=False,
        )
        assert _rows(auto) == _rows(recomputed), (step, lo, hi, committed)
        want = set(range(lo + 1, hi + 1))
        if want <= set(committed):
            strict = table_changes(
                spark, path, ["k"], lo, hi, per_version=True,
                use_changelog=True,
            )
            assert _rows(strict) == _rows(recomputed)
        else:
            with pytest.raises(FileNotFoundError, match="materialize"):
                table_changes(
                    spark, path, ["k"], lo, hi, per_version=True,
                    use_changelog=True,
                )
        cdir = os.path.join(_local(path), "_changelog")
        if os.path.isdir(cdir):
            residue = [
                n
                for n in os.listdir(cdir)
                if n.startswith((".inprogress-", ".expired-"))
                or ".repair-" in n
            ]
            assert residue == [], residue


def test_expire_races_materialize_state_stays_consistent(spark, tmp_path):
    """Post-seal r11 race pin for the new expiry protocol: N threads
    interleave materialize (rebuilding whatever is missing) with
    expire_changelog over the same state. Whatever the interleaving, the
    end state must be CONSISTENT: every surviving version is committed
    WHOLE (marker AND data, readable), strict reads over surviving ranges
    are bit-equal to the recompute, and no version is wedged
    (marker-without-data) or half-deleted. This drives the
    rename-aside-then-delete expiry and the marker repair/restore paths
    under real thread scheduling rather than simulated crashes."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    from embulk_executor_mapreduce_spark.sinks.changes import (
        _changelog_data_dir,
        _changelog_meta_path,
        _local,
        changelog_versions,
        expire_changelog,
        materialize_changes,
    )

    path = str(tmp_path / "state")
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("o",),
        merge_buckets=4,
        merge_keep_versions=5,
    )
    for tag in ("a", "b", "c", "d"):
        write_sink(
            spark.createDataFrame([(1, 0, tag)], "k bigint, o int, s string"),
            sink,
        )  # v0..v3, all manifests retained

    def churn(i):
        for _ in range(3):
            if i % 2 == 0:
                materialize_changes(spark, path, ["k"])
            else:
                expire_changelog(path, 3)  # keep only v3 if it exists
        return True

    with ThreadPoolExecutor(max_workers=4) as ex:
        assert all(ex.map(churn, range(4)))

    # settle: one final materialize rebuilds anything expired mid-flight
    materialize_changes(spark, path, ["k"])
    local = _local(path)
    committed = changelog_versions(path)
    assert committed == [1, 2, 3]
    for v in committed:
        assert os.path.exists(_changelog_meta_path(local, v))
        assert os.path.isdir(_changelog_data_dir(local, v))
    # no wedged versions: every marker has data (changelog_versions
    # already requires both; double-check the inverse direction)
    cdir = os.path.join(local, "_changelog")
    import re

    data_dirs = {
        int(m.group(1))
        for n in os.listdir(cdir)
        if (m := re.match(r"^v(\d+)$", n))
    }
    marker_vs = {
        int(m.group(1))
        for n in os.listdir(cdir)
        if (m := re.match(r"^v(\d+)\.json$", n))
    }
    assert data_dirs == marker_vs == {1, 2, 3}
    strict = table_changes(
        spark, path, ["k"], 0, 3, per_version=True, use_changelog=True
    )
    recomputed = table_changes(
        spark, path, ["k"], 0, 3, per_version=True, use_changelog=False
    )
    assert _rows(strict) == _rows(recomputed)


def test_expire_races_materialize_across_real_processes(spark, tmp_path):
    """r12 (VERDICT r11 item 5): the thread-race test above validates the
    marker/repair/expiry protocol under one process's GIL scheduling; the
    production case is SEPARATE PROCESSES on a shared filesystem (a
    retention cron racing an ETL materializer), where os.rename/os.remove
    atomicity across process boundaries is what actually protects the
    protocol. Two plain-Python child processes hammer expire_changelog
    (it needs no Spark) while the parent loops materialize_changes
    rebuilding whatever they expire. Afterward the state must be
    consistent: a settle materialize restores every version whole
    (marker AND data), strict reads are bit-equal to the recompute, and
    no version is wedged or half-deleted."""
    import os
    import re
    import subprocess
    import sys
    import textwrap

    from embulk_executor_mapreduce_spark.sinks.changes import (
        _changelog_data_dir,
        _changelog_meta_path,
        _local,
        changelog_versions,
        materialize_changes,
    )

    path = str(tmp_path / "state")
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("o",),
        merge_buckets=4,
        merge_keep_versions=5,
    )
    for tag in ("a", "b", "c", "d"):
        write_sink(
            spark.createDataFrame([(1, 0, tag)], "k bigint, o int, s string"),
            sink,
        )  # v0..v3, all manifests retained

    worker = textwrap.dedent(
        f"""
        import sys
        import time
        sys.path.insert(0, {str(__import__("pathlib").Path(__file__).resolve().parents[1])!r})
        from embulk_executor_mapreduce_spark.sinks.changes import expire_changelog
        for _ in range(50):
            expire_changelog({path!r}, 3)  # churn v1/v2 out from under the parent
            time.sleep(0.1)  # spread the 50 iterations across parent rebuilds
        """
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for _ in range(2)
    ]
    # parent: keep rebuilding what the children expire (50 iterations total
    # across the children; the parent loops until both exit)
    rounds = 0
    while any(p.poll() is None for p in procs):
        materialize_changes(spark, path, ["k"])
        rounds += 1
    for p in procs:
        _out, err = p.communicate()
        assert p.returncode == 0, err.decode()
    assert rounds >= 1

    # settle + full consistency sweep (same bar as the threaded race test)
    materialize_changes(spark, path, ["k"])
    local = _local(path)
    committed = changelog_versions(path)
    assert committed == [1, 2, 3]
    for v in committed:
        assert os.path.exists(_changelog_meta_path(local, v))
        assert os.path.isdir(_changelog_data_dir(local, v))
    cdir = os.path.join(local, "_changelog")
    data_dirs = {
        int(m.group(1))
        for n in os.listdir(cdir)
        if (m := re.match(r"^v(\d+)$", n))
    }
    marker_vs = {
        int(m.group(1))
        for n in os.listdir(cdir)
        if (m := re.match(r"^v(\d+)\.json$", n))
    }
    assert data_dirs == marker_vs == {1, 2, 3}
    strict = table_changes(
        spark, path, ["k"], 0, 3, per_version=True, use_changelog=True
    )
    recomputed = table_changes(
        spark, path, ["k"], 0, 3, per_version=True, use_changelog=False
    )
    assert _rows(strict) == _rows(recomputed)
