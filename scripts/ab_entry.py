"""Isolated warm A/B of one or more bench entries — the mover triage tool.

The bench's drift probe is pure CPU, so shuffle-/IO-heavy small entries can
move 2-3x between rounds on a byte-identical tree (r12: audio_features_wav
1.64x; r13: ann_pq_adc_topk 2.8x, url_canonical_dedup 2.3x — all
function-source-identical to the prior seal). Before treating a mover as a
regression: (1) check byte-identity of the entry's module/function against
the prior seal commit (`git show <seal>:<module> | diff - <module>`, or the
AST check below with --since), (2) run this script — the converged warm
floor on the CURRENT host is the number to compare, not the sealed one.

Usage:
  python scripts/ab_entry.py <entry> [entry ...] [--sf DIR] [--runs N]
      [--since COMMIT]

--since COMMIT additionally reports whether each entry's catalog fn source
and its one-level `from .X import` modules are byte-identical to COMMIT.
"""

from __future__ import annotations

import argparse
import ast
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _fn_source(module_src: str, fn_name: str) -> str | None:
    try:
        tree = ast.parse(module_src)
    except SyntaxError:
        return None
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == fn_name:
            return ast.get_source_segment(module_src, node)
    return None


def _modules_of(fn_src: str) -> list[str]:
    return re.findall(r"from \.(?:operators|sources|sinks|streaming|plans)?"
                      r"\.?(\w+) import", fn_src or "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--since", default=None, metavar="COMMIT")
    args = ap.parse_args()

    from embulk_executor_mapreduce_spark import catalog
    from embulk_executor_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="ab_entry")
    reg = catalog.entries()
    import inspect

    for name in args.entries:
        e = reg.get(name)
        if e is None:
            print(f"{name}: UNKNOWN entry")
            continue
        if args.since:
            fn_src = inspect.getsource(e.fn)
            same = []
            cat_now = open(ROOT / "embulk_executor_mapreduce_spark/catalog.py").read()
            try:
                cat_old = subprocess.run(
                    ["git", "show",
                     f"{args.since}:embulk_executor_mapreduce_spark/catalog.py"],
                    capture_output=True, text=True, cwd=ROOT, check=True,
                ).stdout
                same.append(
                    ("fn", _fn_source(cat_old, e.fn.__name__)
                     == _fn_source(cat_now, e.fn.__name__))
                )
            except subprocess.CalledProcessError:
                same.append(("fn", None))
            print(f"{name}: identity vs {args.since}: {same}")
        times = []
        for i in range(args.runs):
            t0 = time.time()
            e.fn(spark, args.sf).collect()
            times.append(round(time.time() - t0, 3))
        print(f"{name}: runs={times} warm_floor={min(times[1:] or times)}")


if __name__ == "__main__":
    main()
