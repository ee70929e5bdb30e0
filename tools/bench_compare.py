"""Diff two bench result files and flag per-query regressions.

The driver records BENCH_r{N}.json per round; this tool is the drift
monitor the round reviews run by hand: common-query ratios, new/dropped
queries, and a sorted regression table.

Usage:
    python tools/bench_compare.py BENCH_r05.json BENCH_r06.json [--flag 1.25]

Either file may be the raw bench line ({"queries": {...}}) or the driver's
wrapper ({"parsed": {...}} / {"tail": "..."}); both forms are handled.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        data = json.load(f)
    for candidate in (data, data.get("parsed") or {}):
        if isinstance(candidate, dict) and isinstance(candidate.get("queries"), dict):
            return {k: float(v) for k, v in candidate["queries"].items()}
    tail = data.get("tail")
    if isinstance(tail, str):
        for line in reversed(tail.splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    parsed = json.loads(line)
                except ValueError:
                    continue
                if isinstance(parsed.get("queries"), dict):
                    return {k: float(v) for k, v in parsed["queries"].items()}
    raise SystemExit(f"{path}: no queries dict found")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--flag", type=float, default=1.25,
                    help="flag ratio threshold (new/old)")
    args = ap.parse_args()

    old, new = load_queries(args.old), load_queries(args.new)
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    dropped = sorted(set(old) - set(new))

    rows = []
    for name in common:
        o, n = old[name], new[name]
        ratio = n / o if o > 0 else float("inf")
        rows.append((ratio, name, o, n))
    rows.sort(reverse=True)

    flagged = [r for r in rows if r[0] >= args.flag]
    print(f"common {len(common)}  added {len(added)}  dropped {len(dropped)}")
    print(f"old total {sum(old[n] for n in common):.2f}s  "
          f"new total {sum(new[n] for n in common):.2f}s  (common set)")
    if added:
        print("added:", ", ".join(f"{n} ({new[n]:.2f}s)" for n in added))
    if dropped:
        print("dropped:", ", ".join(dropped))
    print(f"\n{'ratio':>6}  {'old':>7}  {'new':>7}  query")
    for ratio, name, o, n in rows[:15]:
        mark = " <-- FLAG" if ratio >= args.flag else ""
        print(f"{ratio:6.2f}  {o:7.3f}  {n:7.3f}  {name}{mark}")
    print(f"\n{len(flagged)} queries at or above the {args.flag:.2f}x flag threshold")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
