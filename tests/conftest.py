from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from embulk_executor_mapreduce_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture
def ck_plans(spark, monkeypatch) -> list[str]:
    """localCheckpoint spy (the r16 checkpointed-subplan guard pattern,
    factored once — it had been copy-pasted across five plan guards):
    yields a list that accumulates the executedPlan string of every frame
    a query checkpoints, eager or lazy, so guards can assert plan
    properties inside checkpoint-truncated subplans. Patches the CONCRETE
    DataFrame class — Spark 4 splits the ABC in pyspark.sql.dataframe
    from pyspark.sql.classic.dataframe."""
    DF = type(spark.range(1))
    plans: list[str] = []
    orig_ck = DF.localCheckpoint

    def spy(self, eager=True, *a, **kw):
        # pass-through signature (r17, ADVICE r16): PySpark 4.1's
        # localCheckpoint also takes storageLevel — swallowing it here
        # would silently change code under test
        plans.append(self._jdf.queryExecution().executedPlan().toString())
        return orig_ck(self, eager, *a, **kw)

    monkeypatch.setattr(DF, "localCheckpoint", spy)
    return plans


def pytest_addoption(parser):
    parser.addoption(
        "--driver-sweep",
        action="store_true",
        default=False,
        help=(
            "also run the driver-scale (sf0.01) full-catalog oracle sweep — "
            "~10 min; the cheap way for a round to re-confirm the "
            "beyond-window queries instead of trusting hash-gating alone"
        ),
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "driver_sweep: driver-scale (sf0.01) oracle sweep, opt-in via --driver-sweep",
    )
    config.addinivalue_line(
        "markers",
        "pillow_env_waiver: ENVIRONMENT WAIVER — the build container cannot "
        "install Pillow (no pip/apt), so the production C-speed decode twin "
        "cannot run here; the stdlib decode twin runs unconditionally and "
        "SCALING.md §'Media codec breadth' records the constraint. On any "
        "host with Pillow this test runs (and must pass) automatically.",
    )


def pytest_collection_modifyitems(config, items):
    # deselect (not skip) so the default run's summary stays clean
    if config.getoption("--driver-sweep"):
        return
    deselected = [i for i in items if "driver_sweep" in i.keywords]
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = [i for i in items if "driver_sweep" not in i.keywords]
