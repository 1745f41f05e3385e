"""scripts/changelog_admin.py — the ops CLI over the changelog lifecycle.

Covers the Spark-free verbs end to end via subprocess (status is
read-only by design — it must never spin a session; expire delegates to
sinks.changes.expire_changelog). The materialize verb's engine path is
the library function, already covered exhaustively in tests/test_changes;
here we only assert its CLI wiring parses (--help)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

SCRIPT = str(Path(__file__).resolve().parent.parent / "scripts" / "changelog_admin.py")


def _run(*args):
    out = subprocess.run(
        [sys.executable, SCRIPT, *args], capture_output=True, text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-1500:]
    return out.stdout


@pytest.fixture()
def state(spark, tmp_path):
    from embulk_executor_mapreduce_spark.sinks.changes import (
        materialize_changes,
    )
    from embulk_executor_mapreduce_spark.sinks.writer import write_sink
    from embulk_executor_mapreduce_spark.spec import SinkSpec

    path = str(tmp_path / "state")
    sink = SinkSpec(
        type="parquet",
        path=path,
        mode="merge",
        merge_key=("k",),
        merge_order=("o",),
        merge_buckets=4,
        merge_keep_versions=3,
    )
    for tag in ("a", "b", "c"):
        write_sink(
            spark.createDataFrame([(1, 0, tag)], "k bigint, o int, s string"),
            sink,
        )
    materialize_changes(spark, path, ["k"])
    return path


def test_status_is_sparkfree_and_reports_lifecycle(state):
    got = json.loads(_run("status", state))
    assert got["current_version"] == 2
    assert got["retained_manifests"] == [0, 2]
    assert got["changelog_versions"] == [1, 2]
    assert got["markers_without_data"] == []
    assert got["scratch_residue"] == []


def test_status_surfaces_wedged_marker_and_residue(state):
    import os
    import time

    from embulk_executor_mapreduce_spark.sinks.changes import (
        _changelog_data_dir,
        _local,
    )

    # wedge v1 (marker without data) + drop a stale scratch dir
    import shutil

    shutil.rmtree(_changelog_data_dir(_local(state), 1))
    cdir = os.path.join(_local(state), "_changelog")
    orphan = os.path.join(cdir, ".inprogress-v9-dead")
    os.mkdir(orphan)
    past = time.time() - 7200
    os.utime(orphan, (past, past))

    got = json.loads(_run("status", state))
    assert got["markers_without_data"] == [1]
    assert got["changelog_versions"] == [2]
    (res,) = got["scratch_residue"]
    assert res["name"] == ".inprogress-v9-dead" and res["stale"] is True


def test_expire_verb(state):
    got = json.loads(_run("expire", state, "--before", "2").strip())
    assert got == {"expired": [1]}
    status = json.loads(_run("status", state))
    assert status["changelog_versions"] == [2]


def test_materialize_cli_parses():
    out = subprocess.run(
        [sys.executable, SCRIPT, "materialize", "--help"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert out.returncode == 0
    for flag in ("--keys", "--format", "--through-version", "--keep-versions"):
        assert flag in out.stdout


def test_bitmap_verb_wiring(state, spark):
    # the engine path (write_state_bitmap) is covered in
    # tests/test_runtimefilter.py; here assert the CLI flags parse and the
    # verb is wired to it (in-process — the subprocess would spin a second
    # Spark session just for the wiring check)
    out = subprocess.run(
        [sys.executable, SCRIPT, "bitmap", "--help"],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert out.returncode == 0
    for flag in ("--keys", "--format", "--bits-per-key", "--num-hashes"):
        assert flag in out.stdout
    from embulk_executor_mapreduce_spark.operators.runtimefilter import (
        read_state_bitmap,
        write_state_bitmap,
    )

    meta = write_state_bitmap(spark, state, ["k"])
    assert meta["version"] == 2 and meta["n_keys"] == 1
    assert read_state_bitmap(spark, state, ["k"])[1] == meta
