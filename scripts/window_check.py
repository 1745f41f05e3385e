"""Driver-window safety gate (VERDICT r2 item 1).

The round driver snapshots only the FIRST 50 registered queries, so
``catalog._VERIFY_FIRST`` must contain every query whose current code has
never produced a green driver row. This script makes that claim a CHECK,
not an assertion in prose:

* body hash per query = sha256(fn source + oracle SQL + the full source of
  every engine module the fn imports) — coarse at module granularity on
  purpose: an operator-module edit flags every query that uses it;
* ``VERIFIED.json`` records, per query, the body hash it carried when its
  last green driver row was produced (maintained by
  ``scripts/record_verified.py`` after each round's CORRECTNESS file lands);
* the gate: every query BEYOND slot 50 of ``catalog.entries()`` must have
  a recorded green hash equal to its current hash. Exit 1 otherwise.

Run: ``python scripts/window_check.py`` (prints the violation list).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from embulk_executor_mapreduce_spark import catalog  # noqa: E402

PKG = ROOT / "embulk_executor_mapreduce_spark"
WINDOW = 50
VERIFIED_PATH = ROOT / "scripts" / "VERIFIED.json"

# Explicit over-the-cap waivers: queries flagged by the (deliberately
# coarse) module-granularity hash whose own fn/oracle AND every function
# they actually call are unchanged — verified by reading the module diff.
# Each deferral must carry a justification and should rotate into the next
# round's window. Round 7: EMPTY — all 19 r6 waivers (text.py / streaming
# additive-diff deferrals) hold window slots this round and zero new
# deferrals were taken (VERDICT r6 item 4: waiver debt drains to zero).
# Round 16: EMPTY — both r15 waived rows (stream_cdc_postings_ingest,
# stream_cdc_semantic_ingest) rotated into window slots 1-2 automatically
# once record_verified.py absorbed CORRECTNESS_r15 (their VERIFIED entries
# stayed at r14 hashes, so oldest-evidence-first ordering promoted them);
# waiver debt drains to zero per VERDICT r15 item 2.
#
# Round 16 OPTIMIZATION phase: the perf work touches the widely-imported
# operator modules (sinks/writer.py, operators/dedup.py) with
# semantics-neutral changes only — batch persist + clustered bucket-dir
# writes in the merge sink, localCheckpoint materialization of the
# incremental hash/signature/assignment frames — flagging 54 rows against
# the 50-slot window. The 4 overflow rows below are waived: each row's own
# fn + oracle are byte-unchanged; the flagged module diff is exactly the
# localCheckpoint/persist/repartition lines named per row; and this
# OPTIMIZATION round's driver re-verifies EVERY declared query against the
# DuckDB oracle (not a 50-row window), with the builder's own full-catalog
# sweep (172/172 green, sf0.01, shuffle_partitions=16) committed as interim
# evidence. All four must rotate into the next round's window first.
DEFERRED: dict[str, str] = {
    "mmr_diverse_topk": (
        "flagged only via operators/dedup.py (fn imports semantic_dedup_k "
        "sizing); the r16 dedup.py diff is localCheckpoint materialization "
        "inside incremental_{minhash,semantic[,_two_level]}_dedup — code "
        "this row's fn and oracle never reach; row re-swept green at "
        "sf0.01/partitions=16 this round"
    ),
    "semantic_dedup_incremental_state": (
        "flagged by the r16 dedup.py localCheckpoint of the assign frame "
        "inside incremental_semantic_dedup (same rows, lineage truncation "
        "only) + the writer.py clustered bucket-dir write (same committed "
        "rows, one file per bucket) + the writer.py manifest schema stamp "
        "(schema source swap, byte-equality pinned in "
        "test_manifest_schema_stamp.py); row re-swept green at "
        "sf0.01/partitions=16 this round"
    ),
    "semantic_dedup_two_level_incremental_state": (
        "flagged by the r16 dedup.py localCheckpoint of the assign-only "
        "branch inside incremental_semantic_dedup_two_level + the writer.py "
        "clustered write + manifest schema stamp; plan guards updated to "
        "assert the broadcast in the checkpointed subplan; row re-swept "
        "green at sf0.01/partitions=16 this round"
    ),
    "stream_cdc_ann_index_ingest": (
        "flagged via writer.py/ingest.py (merge-sink persist-once + "
        "clustered write + manifest schema stamp; the ingest.py diff is the "
        "image sibling's feed persist, a function this row's fn never "
        "calls); row re-swept green at sf0.01/partitions=16 this round"
    ),
}


def body_hash(entry, _cache: dict | None = None) -> str:
    """Delegates to catalog._body_hash — ONE implementation (r12 review
    finding 3: a hand-synchronized copy here silently diverged the gate's
    hash from the window-ordering hash the moment either changed)."""
    return catalog._body_hash(entry, _cache if _cache is not None else {})


def current_hashes() -> dict[str, str]:
    cache: dict = {}
    return {name: body_hash(e, cache) for name, e in catalog.entries().items()}


def main() -> None:
    cur = current_hashes()
    names = list(cur)
    verified = (
        json.loads(VERIFIED_PATH.read_text()) if VERIFIED_PATH.exists() else {}
    )
    in_window = set(names[:WINDOW])
    beyond = names[WINDOW:]
    violations = []
    deferred_hit = []
    for name in beyond:
        rec = verified.get(name)
        if rec is not None and rec["hash"] == cur[name]:
            continue
        if name in DEFERRED:
            deferred_hit.append(name)
            continue
        if rec is None:
            violations.append((name, "never driver-verified"))
        else:
            violations.append((name, f"changed since green row ({rec['round']})"))
    if deferred_hit:
        print(f"\nDEFERRED ({len(deferred_hit)}) — explicit waivers, rotate next round:")
        for n in deferred_hit:
            print(f"  {n}: {DEFERRED[n]}")
    stale_in_window = [
        n
        for n in in_window
        if verified.get(n, {}).get("hash") == cur[n]
    ]
    print(f"queries: {len(names)}, window: {len(in_window)}, beyond: {len(beyond)}")
    print(
        "window slots on already-green-at-current-hash rows (spare capacity, "
        f"auto-filled oldest-evidence-first since r12): {len(stale_in_window)}"
    )
    # Rotation health (VERDICT r11 item 8): with catalog.entries() ordering
    # by verification need, no green IN-WINDOW row should carry NEWER
    # evidence than a green BEYOND-window row — such a pair means a slot is
    # wasted on fresh evidence while older evidence waits. List offenders.
    oldest_beyond = min(
        (
            catalog._round_key(verified[n]["round"])
            for n in beyond
            if verified.get(n, {}).get("hash") == cur[n]
        ),
        default=None,
    )
    misordered = sorted(
        n
        for n in stale_in_window
        if oldest_beyond is not None
        and catalog._round_key(verified[n]["round"]) > oldest_beyond
    )
    print(f"rotation candidates (misordered vs oldest beyond-window evidence): {len(misordered)}")
    if misordered:
        print("  ", ", ".join(misordered))
    if violations:
        print(f"\nVIOLATIONS ({len(violations)}): beyond-window queries lacking a")
        print("green driver row at their current body hash:")
        for n, why in violations:
            print(f"  {n}: {why}")
        sys.exit(1)
    print("\nOK: every beyond-window query is green at its current hash.")


if __name__ == "__main__":
    main()
