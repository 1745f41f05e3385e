"""run_independent_actions semantics (r16 optimization round, guide §2.6).

The incremental sinks overlap their corpus-write/state-merge pairs through
this helper; the properties its call sites rely on:

1. Every thunk runs to COMPLETION (or failure) before the call returns —
   no write is left in flight when the caller advances its checkpoint.
2. The first failure BY ARGUMENT ORDER re-raises, matching the sequential
   code's error surface, and a failure in one thunk never cancels the
   others (each write's own idempotence is the recovery story, so partial
   completion is safe — but it must be COMPLETE partial completion).
3. Results come back positionally.
4. Real Spark actions from both threads work against one session (the
   local-property inheritance path the sinks use).
"""

from __future__ import annotations

import time

import pytest

from embulk_executor_mapreduce_spark.session import run_independent_actions


def test_results_positional_and_all_complete():
    done = []

    def slow():
        time.sleep(0.2)
        done.append("slow")
        return "s"

    def fast():
        done.append("fast")
        return "f"

    out = run_independent_actions(slow, fast)
    assert out == ["s", "f"]
    assert sorted(done) == ["fast", "slow"]


def test_first_failure_by_argument_order_wins():
    # thunk 1 fails FAST, thunk 0 fails SLOW — the sequential surface
    # (thunk 0's error) must still be the one raised
    def slow_fail():
        time.sleep(0.2)
        raise ValueError("first-by-order")

    def fast_fail():
        raise RuntimeError("first-by-time")

    with pytest.raises(ValueError, match="first-by-order"):
        run_independent_actions(slow_fail, fast_fail)


def test_one_failure_does_not_cancel_the_other():
    done = []

    def fails():
        raise RuntimeError("boom")

    def completes():
        time.sleep(0.15)
        done.append("completed")

    with pytest.raises(RuntimeError, match="boom"):
        run_independent_actions(fails, completes)
    assert done == ["completed"], (
        "the surviving write must have fully completed before the raise"
    )


def test_single_thunk_runs_inline():
    assert run_independent_actions(lambda: 41 + 1) == [42]


def test_concurrent_spark_actions_share_one_session(spark):
    a = spark.range(0, 1000)
    b = spark.range(0, 500)
    out = run_independent_actions(lambda: a.count(), lambda: b.count())
    assert out == [1000, 500]
