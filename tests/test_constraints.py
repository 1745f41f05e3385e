"""Data-quality constraint suite (operators/constraints.py): violation
counting per kind, tolerance semantics, FK anti-join checks, and the
one-aggregate-pass-per-table plan shape."""

from __future__ import annotations

import pytest

from embulk_executor_mapreduce_spark import catalog
from embulk_executor_mapreduce_spark.operators.constraints import (
    Check,
    constraint_report,
)

SF = "/root/testdata/sf0.001"


def _report(spark, tables, checks):
    rows = constraint_report(tables, checks).collect()
    return {r.constraint_id: r for r in rows}


@pytest.fixture()
def toy(spark):
    orders = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", -5.0), (2, "B", 0.0), (None, "zz", 3.0)],
        "ok bigint, status string, amount double",
    )
    items = spark.createDataFrame(
        [(1, 5.0), (2, 60.0), (9, 1.0), (None, 2.0)],
        "fk bigint, qty double",
    )
    return {"orders": orders, "items": items}


def test_violation_counts_per_kind(spark, toy):
    rep = _report(
        spark,
        toy,
        [
            Check("nn", "orders", "not_null", "ok"),
            Check("uq", "orders", "unique", "ok"),
            Check("dom", "orders", "in_set", "status", ("A", "B")),
            Check("fmt", "orders", "matches", "status", ("^[A-Z]$",)),
            Check("pos", "orders", "expr_holds", None, ("amount > 0",)),
            Check("sz", "orders", "size_min", None, (10,)),
            Check("qb", "items", "bounds", "qty", (0.0, 50.0)),
        ],
    )
    assert (rep["nn"].metric, rep["nn"].passed) == (1, False)
    # ok has 3 non-null values, 2 distinct → 1 duplicate
    assert (rep["uq"].metric, rep["uq"].passed) == (1, False)
    # 'zz' out of domain; NULL-free column so exactly 1
    assert (rep["dom"].metric, rep["dom"].passed) == (1, False)
    assert (rep["fmt"].metric, rep["fmt"].passed) == (1, False)
    # -5.0 and 0.0 violate amount > 0
    assert (rep["pos"].metric, rep["pos"].passed) == (2, False)
    assert (rep["sz"].metric, rep["sz"].passed) == (4, False)
    # qty=60 violates; NULL fk row's qty=2.0 is fine; bounds count NULL qty
    assert (rep["qb"].metric, rep["qb"].passed) == (1, False)
    assert rep["nn"].tbl == "orders" and rep["nn"].kind == "not_null"


def test_fk_subset_ignores_null_child_keys(spark, toy):
    rep = _report(
        spark,
        toy,
        [Check("fk", "items", "fk_subset", "fk", ("orders", "ok"))],
    )
    # fk=9 has no parent; fk=NULL is not a violation (SQL FK semantics)
    assert (rep["fk"].metric, rep["fk"].passed) == (1, False)


def test_tolerance_flips_passed_without_changing_metric(spark, toy):
    rep = _report(
        spark,
        toy,
        [
            Check("strict", "orders", "in_set", "status", ("A", "B")),
            Check("tol", "orders", "in_set", "status", ("A", "B"), tol=1),
        ],
    )
    assert rep["strict"].metric == rep["tol"].metric == 1
    assert not rep["strict"].passed and rep["tol"].passed


def test_all_green_report(spark, toy):
    rep = _report(
        spark,
        toy,
        [
            Check("dom", "orders", "in_set", "status", ("A", "B", "zz")),
            Check("sz", "orders", "size_min", None, (1,)),
        ],
    )
    assert all(r.passed for r in rep.values())


def test_duplicate_ids_and_unknown_kind_raise(spark, toy):
    with pytest.raises(ValueError, match="unique"):
        constraint_report(
            toy,
            [
                Check("x", "orders", "not_null", "ok"),
                Check("x", "orders", "not_null", "status"),
            ],
        )
    with pytest.raises(ValueError, match="unknown constraint kind"):
        Check("y", "orders", "no_such_kind", "ok")


def test_catalog_query_one_scan_per_table(spark):
    """The 15-constraint catalog suite reads each of the 5 tables exactly
    once for its fused aggregate pass, plus single-key-column scans of the
    FK child and parent — 7 parquet scans total, regardless of constraint
    count, every one pruned to exactly the referenced columns."""
    df = catalog.entries()["dq_constraint_report"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 7, plan
    # the two FK scans are pruned to the single join key
    assert "Scan parquet [l_orderkey" in plan
    assert "Scan parquet [o_orderkey#" in plan.replace("\n", " ")


def test_catalog_query_row_count_and_designed_failures(spark):
    rows = catalog.entries()["dq_constraint_report"].fn(spark, SF).collect()
    assert len(rows) == 15
    by_id = {r.constraint_id: r for r in rows}
    assert not by_id["lineitem_qty_le_40"].passed
    assert not by_id["events_type_domain_strict"].passed
    assert by_id["events_type_domain_tolerant"].passed
    assert by_id["lineitem_fk_orders"].passed


# ---------------------------------------------------------------------------
# Cross-version drift checks over the per-commit CDC feed (VERDICT r9 item 8)
# ---------------------------------------------------------------------------

from embulk_executor_mapreduce_spark.operators.constraints import (  # noqa: E402
    drift_report,
)


def _literal_feed(spark):
    """Hand-built per-version feed: v1 inserts 2 rows (one NULL s), deletes
    1 (non-null s), flips k=1's s from 'a' to NULL; v2 flips k=1 back to a
    value and deletes a NULL-s row."""
    rows = [
        # (k, s, _change_type, _commit_version)
        (10, None, "insert", 1),
        (11, "x", "insert", 1),
        (2, "b", "delete", 1),
        (1, "a", "update_preimage", 1),
        (1, None, "update_postimage", 1),
        (1, None, "update_preimage", 2),
        (1, "c", "update_postimage", 2),
        (10, None, "delete", 2),
    ]
    return spark.createDataFrame(
        rows, "k bigint, s string, _change_type string, _commit_version bigint"
    )


def test_drift_metrics_closed_form(spark):
    """Closed-form expectations: v1 row_delta = 2 inserts − 1 delete = +1,
    null_delta(s) = +1 (insert NULL) + 1 (update flips to NULL) = +2;
    v2 row_delta = −1, null_delta(s) = −1 (flip back) − 1 (delete NULL row)
    = −2."""
    rep = drift_report(
        _literal_feed(spark),
        [
            Check("rd", "state", "row_delta", params=(-1, 1)),
            Check("nd", "state", "null_delta", column="s", params=(0, 1)),
        ],
    ).collect()
    got = {(r.constraint_id, r._commit_version): (r.metric, r.passed) for r in rep}
    assert got == {
        ("rd", 1): (1, True),
        ("rd", 2): (-1, True),
        ("nd", 1): (2, False),  # two net new NULLs > hi=1
        ("nd", 2): (-2, False),  # below lo=0
    }
    one = rep[0]
    assert one.tbl == "state" and one.kind in ("row_delta", "null_delta")


def test_drift_report_matches_python_snapshot_reference(spark, tmp_path):
    """E2E closed-form oracle: three committed merge-sink versions, the real
    per-version feed (BOTH provenances: recompute and persisted changelog),
    and drift metrics recomputed independently from plain-Python dict
    snapshots — row_delta must equal len(v)−len(v−1) and null_delta the
    null-count difference, per commit."""
    from embulk_executor_mapreduce_spark.sinks.changes import (
        materialize_changes,
        table_changes,
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
    batches = [
        [(k, 0, f"v{k}" if k % 3 else None) for k in range(12)],
        [(3, 0, None), (100, 0, "NEW"), (101, 0, None)],
        [(3, 0, "v3"), (5, 0, None), (102, 0, None)],
    ]
    snapshots = [{}]
    for b in batches:
        snap = dict(snapshots[-1])
        snap.update({k: s for k, o, s in b})
        snapshots.append(snap)
        write_sink(
            spark.createDataFrame(b, "k bigint, o int, s string"), sink
        )
    checks = [
        Check("rd", "state", "row_delta", params=(0, 2)),
        Check("nd", "state", "null_delta", column="s", params=(0, 1)),
    ]
    materialize_changes(spark, path, ["k"])
    for use in (False, True):
        feed = table_changes(
            spark, path, ["k"], 0, 2, per_version=True, use_changelog=use
        )
        rep = {
            (r.constraint_id, r._commit_version): (r.metric, r.passed)
            for r in drift_report(feed, checks).collect()
        }
        for v in (1, 2):
            prev, cur = snapshots[v], snapshots[v + 1]
            rd = len(cur) - len(prev)
            nd = sum(s is None for s in cur.values()) - sum(
                s is None for s in prev.values()
            )
            assert rep[("rd", v)] == (rd, 0 <= rd <= 2), (use, v)
            assert rep[("nd", v)] == (nd, 0 <= nd <= 1), (use, v)


def test_drift_report_single_fused_agg_pass(spark):
    """N drift checks = one groupBy(_commit_version) aggregation — a single
    exchange, no join, no Python."""
    feed = _literal_feed(spark)
    rep = drift_report(
        feed,
        [
            Check("rd", "s", "row_delta", params=(-9, 9)),
            Check("n1", "s", "null_delta", column="s", params=(-9, 9)),
            Check("n2", "s", "null_delta", column="k", params=(-9, 9)),
        ],
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan and "Python" not in plan


def test_drift_error_paths(spark, toy):
    feed = _literal_feed(spark)
    with pytest.raises(ValueError, match="drift_report"):
        constraint_report(
            toy, [Check("rd", "orders", "row_delta", params=(0, 1))]
        )
    with pytest.raises(ValueError, match="not a drift kind"):
        drift_report(feed, [Check("nn", "s", "not_null", column="s")])
    with pytest.raises(ValueError, match="missing from the feed"):
        drift_report(
            feed, [Check("nd", "s", "null_delta", column="zz", params=(0, 1))]
        )
    with pytest.raises(ValueError, match="params"):
        drift_report(feed, [Check("rd", "s", "row_delta", params=(1,))])
    with pytest.raises(ValueError, match="per-version CDC feed"):
        drift_report(feed.drop("_commit_version"), [
            Check("rd", "s", "row_delta", params=(0, 1))
        ])
    with pytest.raises(ValueError, match="unique"):
        drift_report(feed, [
            Check("rd", "s", "row_delta", params=(0, 1)),
            Check("rd", "s", "row_delta", params=(0, 2)),
        ])
