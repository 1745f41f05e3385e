"""Progress & report collection (SURVEY.md §2.2 O15).

The reference polls JSON attempt-state files on HDFS and folds them into
Embulk's ProcessState (``MapReduceExecutor.java:313-342``, dedupe at
``:139-198``). Spark surfaces the same information in-band: the status
tracker exposes live job/stage/task progress, and failures arrive as raised
exceptions — no state files, no attempt-dedup (Spark's scheduler already
dedupes attempts; committed > running is the file-commit protocol's job).

`ProgressMonitor` samples active stages while an action runs, producing the
per-task progress trail the reference built by polling HDFS.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import SparkSession


@dataclass
class ProgressSample:
    t_offset: float
    stage_id: int
    num_tasks: int
    num_complete: int
    num_active: int
    num_failed: int


@dataclass
class RunTrail:
    samples: list[ProgressSample] = field(default_factory=list)
    wall_seconds: float = 0.0
    result: Any = None

    def max_concurrent_tasks(self) -> int:
        return max((s.num_active for s in self.samples), default=0)

    def stages_seen(self) -> set[int]:
        return {s.stage_id for s in self.samples}

    def any_failures(self) -> bool:
        return any(s.num_failed > 0 for s in self.samples)


class ProgressMonitor:
    """Samples live stage progress while a Spark action runs."""

    def __init__(self, spark: SparkSession, interval: float = 0.1) -> None:
        self._sc = spark.sparkContext
        self._interval = interval

    def run(self, action: Callable[[], Any]) -> RunTrail:
        trail = RunTrail()
        stop = threading.Event()
        t0 = time.time()

        def sample() -> None:
            tracker = self._sc.statusTracker()
            while not stop.is_set():
                for sid in tracker.getActiveStageIds():
                    info = tracker.getStageInfo(sid)
                    if info is None:
                        continue
                    trail.samples.append(
                        ProgressSample(
                            t_offset=round(time.time() - t0, 3),
                            stage_id=sid,
                            num_tasks=info.numTasks,
                            num_complete=info.numCompletedTasks,
                            num_active=info.numActiveTasks,
                            num_failed=info.numFailedTasks,
                        )
                    )
                stop.wait(self._interval)

        poller = threading.Thread(target=sample, daemon=True)
        poller.start()
        try:
            trail.result = action()
        finally:
            stop.set()
            poller.join(timeout=2)
            trail.wall_seconds = round(time.time() - t0, 3)
        return trail
