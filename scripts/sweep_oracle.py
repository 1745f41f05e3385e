"""Full-catalog DuckDB oracle sweep at any scale factor.

The driver verifies the 50-query window at sf0.01; the pytest battery
(--driver-sweep) repeats that for all queries, still at sf0.01. This
script runs the SAME value-hash compare at an arbitrary SF — the r9
second-seal check ran it at sf0.1 (10× the driver's correctness scale)
and recorded 130/130 green. Use it to prove scale-stability of the
deterministic constructs (md5-ordered caps, exactmath rounding, integer
pagerank, banded minhash, CDC replay) before a seal, or to bisect a
scale-dependent hash break.

Usage:
    python scripts/sweep_oracle.py                      # sf0.1, all
    python scripts/sweep_oracle.py /root/testdata/sf0.01
    python scripts/sweep_oracle.py sf0.1 --start 50     # beyond-window
    python scripts/sweep_oracle.py sf0.1 --only name1,name2

Prints one line per failure and a final JSON summary; exit 1 on any FAIL.
Budget: ~20 min for all 130 at sf0.1 on local[32].
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--start", type=int, default=0, help="first entry index")
    ap.add_argument("--stop", type=int, default=None, help="stop entry index")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument(
        "--shuffle-partitions",
        type=int,
        default=32,
        help="adversarial-partitioning sweeps (r9 ran the catalog at 7 — a "
        "tiny prime nothing like the driver's 16/32 — to prove no hash "
        "depends on aggregation/merge order across partitions)",
    )
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        metavar="K=V",
        help="extra session conf, repeatable (e.g. "
        "--conf spark.sql.adaptive.enabled=false for the AQE-off sweep)",
    )
    args = ap.parse_args()
    sf_dir = args.sf_dir
    if "/" not in sf_dir:
        sf_dir = f"/root/testdata/{sf_dir}"

    from embulk_executor_mapreduce_spark import catalog
    from embulk_executor_mapreduce_spark.session import get_spark
    from tests.oracle import compare

    spark = get_spark(
        app_name="sweep_oracle", shuffle_partitions=args.shuffle_partitions
    )
    for kv in args.conf:
        k, sep, v = kv.partition("=")
        if not sep or not k or not v:
            # a typo'd --conf must fail loudly, not archive a green sweep
            # under an adversarial config that never applied
            ap.error(f"--conf wants K=V, got {kv!r}")
        spark.conf.set(k, v)
    entries = catalog.entries()
    names = list(entries)[args.start : args.stop]
    if args.only:
        wanted = {n.strip() for n in args.only.split(",")}
        names = [n for n in names if n in wanted]

    t0 = time.time()
    fails, skipped, n = [], [], 0
    for name in names:
        e = entries[name]
        if e.oracle is None:
            skipped.append(name)
            continue
        try:
            ok, msg = compare(spark, sf_dir, e.fn, e.oracle)
        except Exception as ex:  # noqa: BLE001 — a sweep must not die mid-list
            ok, msg = False, f"EXC {type(ex).__name__}: {str(ex)[:160]}"
        n += 1
        if not ok:
            print(f"FAIL {name}: {msg}", flush=True)
            fails.append(name)
    print(
        json.dumps(
            {
                "metric": "oracle_sweep",
                "sf_dir": sf_dir,
                "shuffle_partitions": args.shuffle_partitions,
                "conf": args.conf,
                "swept": n,
                "fails": fails,
                "skipped_no_oracle": skipped,
                "sec": round(time.time() - t0, 1),
            }
        )
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
