"""Timestamp-encoding sweep: every events-touching query × 3 encodings.

The driver's testdata generator has shipped ``events.ts`` under three
physical parquet encodings across rounds — TIMESTAMP(NANOS) (Spark reads
as bigint under the nanosAsLong legacy conf), TIMESTAMP(MICROS)
isAdjustedToUTC=false (loads as TIMESTAMP_NTZ), and TIMESTAMP(MICROS)
isAdjustedToUTC=true (loads as TIMESTAMP). ``catalog.load`` and
``catalog.events_ts_normalize_filters`` normalize all three; this sweep
PROVES that catalog-wide before the next encoding flip instead of
discovering it as a mid-round surprise (first run r9: 35 queries × 3 =
105/105 green; r10 adds ``spec_partitioned_pipeline``, which reads the
raw parquet through the YAML front door — the exact path the footer
probe exists for).

For each encoding a scratch sf dir is built with the re-encoded
``events.parquet`` and symlinks to every other table, and every catalog
query whose fn source mentions the events table runs through the same
DuckDB value-hash compare the driver uses (DuckDB reads the SAME
re-encoded file, so both engines face the flip together).

Usage: ``python scripts/sweep_ts_encodings.py [sf_dir]`` (default
sf0.01). Exit 1 on any FAIL.
"""

from __future__ import annotations

import inspect
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

ENCODINGS = {
    # name → pyarrow timestamp type (written with parquet version 2.6 so
    # nanos stay TIMESTAMP(NANOS) instead of coercing to micros)
    "nanos": pa.timestamp("ns"),
    "micros_ntz": pa.timestamp("us"),
    "micros_utc": pa.timestamp("us", tz="UTC"),
}


def _reencode(src: str, dst: str, ts_type: pa.DataType) -> None:
    t = pq.read_table(src)
    idx = t.schema.get_field_index("ts")
    # safe=False: a genuinely sub-microsecond nanos source truncates to
    # micros instead of raising ArrowInvalid and killing the whole sweep
    # while it builds the micros scratch copies (the sweep must report
    # per-query results for the OTHER encodings regardless)
    col = t.column("ts").cast(ts_type, safe=False)
    t = t.set_column(idx, pa.field("ts", ts_type), col)
    # version 2.6 keeps nanos as TIMESTAMP(NANOS) instead of silently
    # coercing to micros (the 1.0 writer cannot represent nanos)
    pq.write_table(t, dst, version="2.6")


def _scratch_sf(sf_dir: str, encoding: str, ts_type: pa.DataType) -> str:
    scratch = tempfile.mkdtemp(prefix=f"ts_sweep_{encoding}_")
    for p in Path(sf_dir).glob("*.parquet"):
        if p.name == "events.parquet":
            _reencode(str(p), os.path.join(scratch, p.name), ts_type)
        else:
            os.symlink(str(p), os.path.join(scratch, p.name))
    return scratch


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if "/" not in sf_dir:
        sf_dir = f"/root/testdata/{sf_dir}"

    from embulk_executor_mapreduce_spark import catalog
    from embulk_executor_mapreduce_spark.session import get_spark
    from tests.oracle import compare

    spark = get_spark(app_name="ts_encoding_sweep", shuffle_partitions=32)
    # events-touching = the literal table name in the fn source OR the
    # oracle SQL (catches fns that reach events through a helper while the
    # oracle names the view) — over-selection only costs runtime,
    # under-selection costs a mid-round encoding surprise
    events_queries = [
        (name, e)
        for name, e in catalog.entries().items()
        if e.oracle is not None
        and ("events" in inspect.getsource(e.fn) or "events" in e.oracle)
    ]
    t0 = time.time()
    fails, n = [], 0
    for encoding, ts_type in ENCODINGS.items():
        try:
            scratch = _scratch_sf(sf_dir, encoding, ts_type)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping others
            print(f"FAIL [{encoding}] <scratch build>: "
                  f"{type(ex).__name__}: {str(ex)[:160]}", flush=True)
            fails.append(f"{encoding}:<scratch build>")
            continue
        try:
            for name, e in events_queries:
                try:
                    ok, msg = compare(spark, scratch, e.fn, e.oracle)
                except Exception as ex:  # noqa: BLE001 — sweep must not die mid-list
                    ok, msg = False, f"EXC {type(ex).__name__}: {str(ex)[:160]}"
                n += 1
                if not ok:
                    print(f"FAIL [{encoding}] {name}: {msg}", flush=True)
                    fails.append(f"{encoding}:{name}")
        finally:
            shutil.rmtree(scratch, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "ts_encoding_sweep",
                "sf_dir": sf_dir,
                "encodings": list(ENCODINGS),
                "events_queries": len(events_queries),
                "swept": n,
                "fails": fails,
                "sec": round(time.time() - t0, 1),
            }
        )
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
