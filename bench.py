"""Benchmark harness: runs the headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed to completion with a count-free terminal action
(collect on aggregates / write-noop on wide results) so measured time is plan
execution, not result shipping of huge row sets.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from embulk_executor_mapreduce_spark import catalog  # noqa: E402
from embulk_executor_mapreduce_spark.session import get_spark  # noqa: E402

# headline set: parity core + relational + training-data ops
HEADLINE = [
    "scan_project",
    "filter_chain",
    "bucket_hour",
    "q1_pricing_summary",
    "q3_segment_revenue",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "topk_orders_per_customer",
    "window_running_sum",
    "dedup_exact",
    "text_fingerprint",
    "text_stats",
]

# queries whose result is small → collect; otherwise noop-write to execute
SMALL_RESULT = {
    "q1_pricing_summary",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "bucket_hour",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")

    entries = catalog.entries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        e = entries.get(name)
        if e is None:
            continue
        # warm the input cache out of the measurement? No — cold per query,
        # but build the plan first so analysis time isn't counted.
        df = e.fn(spark, sf_dir)
        t0 = time.time()
        if name in SMALL_RESULT:
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
