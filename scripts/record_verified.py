"""Record green driver rows into scripts/VERIFIED.json (window-gate state).

Run at the START of a round, once the previous round's CORRECTNESS file has
landed, BEFORE changing any query code:

    python scripts/record_verified.py CORRECTNESS_r03.json r03

For every query the file shows hash-green (``hash_match: true``), the
query's CURRENT body hash (scripts/window_check.py definition) is recorded
as its verified hash. Running after code edits would record hashes the
driver never actually verified — don't.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from scripts.window_check import VERIFIED_PATH, current_hashes  # noqa: E402


def main() -> None:
    if len(sys.argv) != 3:
        print("usage: python scripts/record_verified.py <CORRECTNESS.json> <round>")
        sys.exit(2)
    rows = json.loads(Path(sys.argv[1]).read_text())
    rnd = sys.argv[2]
    cur = current_hashes()
    verified = (
        json.loads(VERIFIED_PATH.read_text()) if VERIFIED_PATH.exists() else {}
    )
    n = 0
    for name, row in rows.items():
        if row.get("hash_match") is True and name in cur:
            verified[name] = {"hash": cur[name], "round": rnd}
            n += 1
    VERIFIED_PATH.write_text(json.dumps(verified, indent=1, sort_keys=True))
    print(f"recorded {n} green rows from {sys.argv[1]} as {rnd}")


if __name__ == "__main__":
    main()
