"""Dump ``explain("formatted")`` for named queries to plans/<tag>/<name>_<suffix>.txt.

Round-15 optimization protocol (guide §1): capture the physical plan of every
query BEFORE and AFTER a change so the plan diff (Exchange count, join
strategy, PushedFilters, Python-eval nodes) is committable evidence.

Usage:
    python tools/plan_dump.py --tag r15 --suffix before [--sf DIR] name ...
    python tools/plan_dump.py --tag r15 --suffix before --bench   # all bench queries
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--bench", action="store_true", help="all bench queries")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from sqlserver_cdc_to_kafka_spark.registry import bench_queries, load_all
    from sqlserver_cdc_to_kafka_spark.session import get_spark

    reg = load_all()
    names = list(args.names)
    if args.bench:
        names.extend(n for n in sorted(bench_queries()) if n not in names)
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan-dump", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    for name in names:
        try:
            df = reg[name].fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — keep dumping the rest
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exchange = plan.count("Exchange")
        print(f"{name}: {len(plan)} bytes, {n_exchange} Exchange -> {path}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
