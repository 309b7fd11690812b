"""Per-query regression diff between two bench JSON files.

Usage: python scripts/bench_diff.py BENCH_r01.json BENCH_r02.json
Prints a markdown table (query, old, new, ratio) sorted by ratio
descending so regressions surface first; also flags queries present in
only one file.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    def load(path: str) -> dict:
        with open(path) as f:
            obj = json.load(f)
        # The driver's BENCH_r{N}.json wraps the bench line in "parsed".
        return obj["parsed"] if "queries" not in obj and "parsed" in obj else obj

    old, new = load(sys.argv[1]), load(sys.argv[2])
    oq, nq = old.get("queries", {}), new.get("queries", {})
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is not None and b is not None:
            rows.append((b / a if a else float("inf"), name, a, b))
    rows.sort(reverse=True)
    print(f"| query | {sys.argv[1]} | {sys.argv[2]} | ratio |")
    print("|---|---|---|---|")
    for ratio, name, a, b in rows:
        flag = " ⚠" if ratio > 1.3 else ""
        print(f"| {name} | {a:.3f}s | {b:.3f}s | {ratio:.2f}×{flag} |")
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if only_old:
        print(f"\nonly in {sys.argv[1]}: {', '.join(only_old)}")
    if only_new:
        print(f"\nonly in {sys.argv[2]}: {', '.join(only_new)}")
    print(
        f"\ntotal: {old.get('value')}s → {new.get('value')}s "
        f"(sf {old.get('sf')} → {new.get('sf')})"
    )


if __name__ == "__main__":
    main()
