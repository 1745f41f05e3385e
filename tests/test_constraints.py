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
