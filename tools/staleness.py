"""Driver-witness staleness report.

The driver's correctness gate only checks the first 50 queries returned by
``registry.load_all()`` each round, so queries outside that window can regress
silently.  This tool diffs the full registry against the union of
``CORRECTNESS_r*.json`` artifacts and prints, per query, the last round in
which the driver produced a green row — a staleness ranking the rotation in
``registry._DRIVER_PRIORITY`` should follow (stalest first).

Usage:  python tools/staleness.py [--limit N] [--check-window] [--json]

``--check-window`` exits non-zero if any query the current load_all() order
places inside the 50-slot window is fresher than one outside it by more than
one round — i.e. the rotation is wasting slots on recently-witnessed queries
while stale ones wait.

``--json`` replaces the table with ONE machine-readable JSON line (window
head names, age histogram, the check-window verdict) — the committable
artifact the r9 verdict asked for, so the rotation is auditable per-round
without trusting session-log prose.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50  # driver's per-round correctness cap


def witness_rounds() -> dict[str, list[tuple[int, bool]]]:
    """name -> [(round, green)] from every CORRECTNESS_r*.json present."""
    out: dict[str, list[tuple[int, bool]]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            green = bool(
                row.get("rows_match")
                and row.get("schema_match", True)
                and (row.get("hash_match") if row.get("hash_match") is not None else True)
                and not row.get("err")
            )
            out.setdefault(name, []).append((rnd, green))
    return out


def staleness_table() -> list[dict]:
    sys.path.insert(0, REPO)
    from sqlserver_cdc_to_kafka_spark.registry import load_all

    witnesses = witness_rounds()
    latest_round = max(
        (r for rows in witnesses.values() for r, _ in rows), default=0
    )
    rows = []
    for pos, (name, _q) in enumerate(load_all().items()):
        seen = witnesses.get(name, [])
        green_rounds = [r for r, g in seen if g]
        last_green = max(green_rounds) if green_rounds else None
        rows.append(
            {
                "name": name,
                "position": pos,
                "in_window": pos < WINDOW,
                "last_driver_green": last_green,
                "age": (latest_round - last_green) if last_green is not None else None,
                "never_checked": not seen,
            }
        )
    # stalest first: never-checked, then oldest green, then registry order
    rows.sort(
        key=lambda r: (
            0 if r["never_checked"] else 1,
            -(r["age"] if r["age"] is not None else 10**6),
            r["position"],
        )
    )
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=0, help="print only first N rows")
    ap.add_argument("--check-window", action="store_true")
    ap.add_argument("--json", action="store_true", help="one-line JSON artifact")
    args = ap.parse_args()

    rows = staleness_table()
    if not args.json:
        shown = rows[: args.limit] if args.limit else rows
        print(f"{'query':42s} {'pos':>4s} {'win':>3s} {'last_green':>10s} {'age':>4s}")
        for r in shown:
            lg = "never" if r["never_checked"] else str(r["last_driver_green"])
            age = "-" if r["age"] is None else str(r["age"])
            print(
                f"{r['name']:42s} {r['position']:4d} {'y' if r['in_window'] else ' ':>3s}"
                f" {lg:>10s} {age:>4s}"
            )

    waste = False
    out_ages = [
        (r["age"] if r["age"] is not None else 10**6)
        for r in rows
        if not r["in_window"]
    ]
    in_ages = [
        (r["age"] if r["age"] is not None else 10**6)
        for r in rows
        if r["in_window"]
    ]
    if out_ages and in_ages and max(out_ages) > min(in_ages) + 1:
        waste = True

    if args.json:
        hist: dict[str, int] = {}
        for r in rows:
            key = "never" if r["never_checked"] else f"r{r['last_driver_green']}"
            hist[key] = hist.get(key, 0) + 1
        print(
            json.dumps(
                {
                    "n_queries": len(rows),
                    "window": WINDOW,
                    "window_head": [r["name"] for r in rows if r["in_window"]],
                    "never_witnessed": [r["name"] for r in rows if r["never_checked"]],
                    "last_green_histogram": dict(sorted(hist.items())),
                    "max_age_in_window": max(in_ages) if in_ages else None,
                    "max_age_outside_window": max(out_ages) if out_ages else None,
                    "rotation_waste": waste,
                }
            )
        )

    if args.check_window and waste:
        print(
            "\nROTATION WASTE: a query outside the 50-slot window is "
            f">1 round staler (age {max(out_ages)}) than the freshest "
            f"inside it (age {min(in_ages)}).",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
