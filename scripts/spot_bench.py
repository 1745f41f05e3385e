"""Spot-bench a subset of catalog entries at an arbitrary scale point
(r17, VERDICT r16 item 3 — the data-dominated scale point the sf0.1
headline no longer provides: at sf0.1 the suite is driver/protocol-bound
and 8 cores beat 32).

Reuses bench.py's exact timing semantics per entry (TIME_INCLUDES_BUILD /
SMALL_RESULT / noop sink) but times only the named entries, single
best-of-N, no budget machinery. Honors $SPARK_GRAFT_SF_DIR and
$SPARK_GRAFT_CPUS like bench.py — run it once per core count and compare:

  SPARK_GRAFT_SF_DIR=/root/testdata_gen/sf1.0 SPARK_GRAFT_CPUS=32 \
      python scripts/spot_bench.py --out plans/r17/sf1_c32.json <entries>
  SPARK_GRAFT_SF_DIR=/root/testdata_gen/sf1.0 SPARK_GRAFT_CPUS=8 \
      python scripts/spot_bench.py --out plans/r17/sf1_c8.json <entries>

This is a SIDE bench: the sf0.1 full-catalog bench.py run stays the
headline and is untouched.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

DEFAULT_ENTRIES = [
    "stream_cdc_postings_ingest",
    "stream_cdc_image_ingest",
    "ann_ivf_pq_incremental_state",
    "spec_prep_pipeline",
    "semantic_dedup_embeddings",
    "semantic_dedup_two_level",
    "image_neardup_incremental_state",
    "ann_ivf_kmeans_topk",
    "ann_pq_kmeans_topk",
    "graph_pagerank_events",
    "merge_table_changes",
    "dedup_incremental_state",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="*", default=None)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    names = args.entries or DEFAULT_ENTRIES

    import bench
    from embulk_executor_mapreduce_spark import catalog
    from embulk_executor_mapreduce_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="spot_bench")
    entries = catalog.entries()
    result: dict[str, dict] = {}
    for name in names:
        e = entries.get(name)
        if e is None:
            print(f"!! unknown entry {name}", file=sys.stderr)
            continue
        times = []
        # entries bench.py times through run_once follow its exact
        # semantics; entries it times through bespoke _pipeline_benches
        # bodies (graph_*, cdc_*, pipeline_*) are timed fn-INCLUSIVE here
        # — their fn does the work eagerly and the bare action reads a
        # checkpointed result (~0.02 s, meaningless)
        fn_inclusive = (
            name in bench.TIME_INCLUDES_BUILD or name not in bench.HEADLINE
        )
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"spot:{name}")
            if fn_inclusive:
                t0 = time.time()
                df = e.fn(spark, sf_dir)
            else:
                df = e.fn(spark, sf_dir)
                t0 = time.time()
            if name in bench.SMALL_RESULT:
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        result[name] = {"best": min(times), "runs": times}
        print(f"{name}: {times} -> {min(times)}")
    out = {
        "metric": "spot_bench",
        "sf": sf,
        "sf_dir": sf_dir,
        "spark_graft_cpus": os.environ.get("SPARK_GRAFT_CPUS"),
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "entries": result,
        "total_best": round(sum(v["best"] for v in result.values()), 3),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
