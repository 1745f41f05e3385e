"""Which catalog queries does editing a module re-flag? (window planning)

The window gate (`scripts/window_check.py`) hashes each query's fn source +
oracle + the full text of every module the fn imports via ``from .X import``.
Editing a module therefore invalidates the recorded green hash of every
query that imports it — each needs a driver window slot (or a DEFERRED
waiver) before the tree seals. Run this BEFORE editing to price the change:

    python scripts/blast_radius.py operators.dedup spec sinks.writer

With no arguments, prints the full module → queries map plus the FREE list
(modules no query fn imports directly — edits cost zero window slots).
"""

from __future__ import annotations

import inspect
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from embulk_executor_mapreduce_spark import catalog  # noqa: E402
from scripts.window_check import WINDOW  # noqa: E402

_IMP = re.compile(r"from \.([\w.]+) import")


def module_map() -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for name, e in catalog.entries().items():
        for mod in set(_IMP.findall(inspect.getsource(e.fn))):
            out.setdefault(mod, []).append(name)
    return out


def main() -> None:
    mm = module_map()
    in_window = set(list(catalog.entries())[:WINDOW])
    if len(sys.argv) > 1:
        for mod in sys.argv[1:]:
            hits = mm.get(mod, [])
            beyond = [q for q in hits if q not in in_window]
            print(f"{mod}: flags {len(hits)} queries, {len(beyond)} beyond-window")
            for q in hits:
                print(f"  {q}{'' if q in in_window else '  [BEYOND WINDOW]'}")
        return
    for mod in sorted(mm, key=lambda m: -len(mm[m])):
        beyond = sum(q not in in_window for q in mm[mod])
        print(f"{mod}: {len(mm[mod])} queries ({beyond} beyond-window)")
    pkg = ROOT / "embulk_executor_mapreduce_spark"
    allmods = {
        str(p.relative_to(pkg))[:-3].replace("/", ".")
        for p in pkg.rglob("*.py")
        if not p.name.startswith("__")
    }
    print("\nFREE (no query fn imports these — zero window cost):")
    print(" ", ", ".join(sorted(allmods - set(mm))))


if __name__ == "__main__":
    main()
