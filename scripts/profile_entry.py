"""Event-log job profile of one bench/catalog entry — the driver-gap triage
tool (guide §1.1/§7): runs the entry once warm in a session with the Spark
event log enabled, then reports per-job wall, per-SQL-execution wall, and the
inter-job driver gaps (time with zero running jobs) that plan-heavy
protocol entries accumulate.

Usage:
  python scripts/profile_entry.py <entry> [--sf DIR] [--warm N] [--top K]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entry")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", type=int, default=1, help="untimed warm runs first")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    from embulk_executor_mapreduce_spark import catalog
    from embulk_executor_mapreduce_spark.session import get_spark

    log_dir = tempfile.mkdtemp(prefix="spark_events_")
    spark = get_spark(
        app_name=f"profile_{args.entry}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
        },
    )
    reg = catalog.entries()
    e = reg.get(args.entry)
    if e is None:
        print(f"UNKNOWN entry {args.entry}")
        sys.exit(2)

    for _ in range(args.warm):
        e.fn(spark, args.sf).collect()

    sc = spark.sparkContext
    sc.setJobDescription(f"profiled:{args.entry}")
    t0 = time.time()
    e.fn(spark, args.sf).collect()
    wall = time.time() - t0
    sc.setJobDescription(None)
    # flush the event log
    spark.stop()

    events = []
    for p in Path(log_dir).rglob("*"):
        if p.is_file() and not p.name.startswith("appstatus"):
            for line in p.read_text().splitlines():
                try:
                    events.append(json.loads(line))
                except ValueError:
                    pass

    jobs: dict[int, dict] = {}
    execs: dict[int, dict] = {}
    for ev in events:
        k = ev.get("Event")
        if k == "SparkListenerJobStart":
            jid = ev["Job ID"]
            props = ev.get("Properties") or {}
            jobs[jid] = {
                "start": ev["Submission Time"],
                "desc": (props.get("spark.job.description") or "")[:90],
                "exec_id": props.get("spark.sql.execution.id"),
                "stages": len(ev.get("Stage IDs") or []),
            }
        elif k == "SparkListenerJobEnd":
            j = jobs.get(ev["Job ID"])
            if j is not None:
                j["end"] = ev["Completion Time"]
        elif k == "org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart":
            details = ev.get("details") or ""
            site = next(
                (
                    ln.strip()
                    for ln in details.splitlines()
                    if "embulk_executor_mapreduce_spark" in ln or "/repo/" in ln
                ),
                details.splitlines()[0].strip() if details else "",
            )
            execs[ev["executionId"]] = {
                "start": ev["time"],
                "desc": (ev.get("description") or "")[:60],
                "site": site[-100:],
            }
        elif k == "org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd":
            x = execs.get(ev["executionId"])
            if x is not None:
                x["end"] = ev["time"]

    # restrict to the profiled (last) span: jobs whose description matches
    prof = {
        jid: j
        for jid, j in jobs.items()
        if j.get("end") and j["desc"].startswith(f"profiled:{args.entry}")
    }
    if not prof:  # description not propagated (thread-local miss): take the
        # final wall-clock window instead
        tmax = max((j["end"] for j in jobs.values() if j.get("end")), default=0)
        cut = tmax - int(wall * 1000) - 500
        prof = {
            jid: j for jid, j in jobs.items() if j.get("end") and j["start"] >= cut
        }

    spans = sorted((j["start"], j["end"], jid) for jid, j in prof.items())
    busy = 0
    gaps = []
    cur_end = None
    for s, t, _ in spans:
        if cur_end is None or s > cur_end:
            if cur_end is not None:
                gaps.append(s - cur_end)
            cur_end = t
        else:
            cur_end = max(cur_end, t)
        busy += t - s
    # union busy time
    union = 0
    cur_s = cur_e = None
    for s, t, _ in spans:
        if cur_s is None:
            cur_s, cur_e = s, t
        elif s <= cur_e:
            cur_e = max(cur_e, t)
        else:
            union += cur_e - cur_s
            cur_s, cur_e = s, t
    if cur_s is not None:
        union += cur_e - cur_s

    total_gap = sum(gaps)
    print(f"entry={args.entry} wall={wall:.2f}s jobs={len(prof)}")
    print(
        f"job-union busy={union/1000:.2f}s inter-job gaps={total_gap/1000:.2f}s "
        f"(n={len(gaps)}, max={max(gaps, default=0)/1000:.2f}s) "
        f"outside-jobs={wall - union/1000:.2f}s"
    )
    by_dur = sorted(prof.items(), key=lambda kv: kv[1]["start"])
    print("\ntimeline (top slowest marked *):")
    slowest = {
        jid
        for jid, _ in sorted(
            prof.items(), key=lambda kv: kv[1]["end"] - kv[1]["start"]
        )[-args.top :]
    }
    prev_end = None
    for jid, j in by_dur:
        d = (j["end"] - j["start"]) / 1000
        gap = "" if prev_end is None else f" gap={max(0, j['start']-prev_end)/1000:.2f}"
        mark = "*" if jid in slowest else " "
        print(
            f" {mark} job {jid:4d} {d:6.2f}s stages={j['stages']}{gap}  {j['desc'][10:80]}"
        )
        prev_end = max(prev_end or 0, j["end"])

    # SQL executions in the window
    win_lo = min(j["start"] for j in prof.values())
    wx = [
        (x["end"] - x["start"], x.get("site", ""), x["start"])
        for x in execs.values()
        if x.get("end") and x["start"] >= win_lo - 200
    ]
    wx.sort(key=lambda t: t[2])
    print(f"\nSQL executions in window: {len(wx)}, wall sum {sum(d for d,_,_ in wx)/1000:.2f}s (timeline order)")
    for d, site, _ in wx:
        print(f"  {d/1000:6.2f}s  {site}")
    print(f"\nevent log dir: {log_dir}")


if __name__ == "__main__":
    main()
