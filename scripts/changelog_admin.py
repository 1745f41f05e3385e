"""Operational CLI for a merge-sink state's persisted CDC changelog.

The engine's UX is config-first (the reference's whole interface is the
Embulk YAML), but changelog MAINTENANCE is an operator activity — run on
a schedule next to the loads, not inside them. This wraps the three
admin verbs over ``sinks/changes.py``:

    python scripts/changelog_admin.py status /path/to/state
    python scripts/changelog_admin.py materialize /path/to/state \
        --keys doc_id --format parquet [--keep-versions 30]
    python scripts/changelog_admin.py expire /path/to/state --before 120

``status`` is read-only (no Spark session): committed changelog versions,
retained manifest range, and any scratch residue (.inprogress-/.expired-
dirs, .repair- files) with their staleness, so an operator can see a
wedged materializer at a glance. ``materialize``/``expire`` print one
JSON line with the versions acted on.
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


def _status(path: str) -> dict:
    from embulk_executor_mapreduce_spark.sinks.changes import (
        _CHANGELOG_STALE_SEC,
        CHANGELOG_DIR,
        _local,
        changelog_versions,
    )
    from embulk_executor_mapreduce_spark.sinks.writer import (
        _manifest_path,
        _pointer_version,
    )

    local = _local(path)
    current = _pointer_version(local)
    manifests = []
    if current is not None:
        manifests = [
            v
            for v in range(0, current + 1)
            if os.path.exists(_manifest_path(local, v))
        ]
    cdir = os.path.join(local, CHANGELOG_DIR)
    residue = []
    markers_without_data = []
    if os.path.isdir(cdir):
        now = time.time()
        names = set(os.listdir(cdir))
        for name in sorted(names):
            if name.startswith((".inprogress-", ".expired-")) or (
                ".repair-" in name
            ):
                try:
                    age = now - os.path.getmtime(os.path.join(cdir, name))
                except OSError:
                    continue
                residue.append(
                    {
                        "name": name,
                        "age_sec": round(age, 1),
                        "stale": age > _CHANGELOG_STALE_SEC,
                    }
                )
            m = re.match(r"^v(\d+)\.json$", name)
            if m and f"v{m.group(1)}" not in names:
                markers_without_data.append(int(m.group(1)))
    return {
        "state": path,
        "current_version": current,
        "retained_manifests": [min(manifests), max(manifests)]
        if manifests
        else [],
        "changelog_versions": changelog_versions(path),
        "markers_without_data": markers_without_data,
        "scratch_residue": residue,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    st = sub.add_parser("status", help="read-only changelog/retention view")
    st.add_argument("path")

    mt = sub.add_parser("materialize", help="persist missing per-commit diffs")
    mt.add_argument("path")
    mt.add_argument("--keys", required=True, help="comma-separated merge keys")
    mt.add_argument("--format", default="parquet", dest="fmt")
    mt.add_argument("--through-version", type=int, default=None)
    mt.add_argument("--keep-versions", type=int, default=None)

    ex = sub.add_parser("expire", help="drop change files below a version")
    ex.add_argument("path")
    ex.add_argument("--before", type=int, required=True)

    bm = sub.add_parser(
        "bitmap",
        help=(
            "(re)build the anti_state bloom bitmap for the state's current "
            "version (operators/runtimefilter.write_state_bitmap)"
        ),
    )
    bm.add_argument("path")
    bm.add_argument("--keys", required=True, help="comma-separated merge keys")
    bm.add_argument("--format", default="parquet", dest="fmt")
    bm.add_argument("--bits-per-key", type=int, default=16)
    bm.add_argument("--num-hashes", type=int, default=2)

    args = ap.parse_args()
    if args.cmd == "status":
        print(json.dumps(_status(args.path), indent=1))
        return 0
    if args.cmd == "expire":
        from embulk_executor_mapreduce_spark.sinks.changes import (
            expire_changelog,
        )

        removed = expire_changelog(args.path, args.before)
        print(json.dumps({"expired": removed}))
        return 0
    if args.cmd == "bitmap":
        from embulk_executor_mapreduce_spark.operators.runtimefilter import (
            write_state_bitmap,
        )
        from embulk_executor_mapreduce_spark.session import get_spark

        spark = get_spark(app_name="changelog_admin")
        meta = write_state_bitmap(
            spark,
            args.path,
            [k.strip() for k in args.keys.split(",") if k.strip()],
            bits_per_key=args.bits_per_key,
            num_hashes=args.num_hashes,
            fmt=args.fmt,
        )
        print(json.dumps(meta))
        return 0
    # materialize
    from embulk_executor_mapreduce_spark.session import get_spark
    from embulk_executor_mapreduce_spark.sinks.changes import (
        materialize_changes,
    )

    spark = get_spark(app_name="changelog_admin")
    done = materialize_changes(
        spark,
        args.path,
        [k.strip() for k in args.keys.split(",") if k.strip()],
        fmt=args.fmt,
        through_version=args.through_version,
        keep_versions=args.keep_versions,
    )
    print(json.dumps({"materialized": done}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
