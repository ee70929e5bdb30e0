"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end: plan construction + full execution into the
``noop`` sink (every output column is computed — a bare ``count()`` would let
Catalyst prune the payload and overstate throughput).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # ambient load is read BEFORE the runs: the benchmark inflates its own
    # 1-min average, so a post-run read would always show a "busy" box
    load_at_start = [round(x, 2) for x in os.getloadavg()]

    from sqlserver_cdc_to_kafka_spark.registry import bench_queries
    from sqlserver_cdc_to_kafka_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)

    # warm the JVM + parquet footer caches with a trivial action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # warm the Arrow python-worker pool too: the first mapInPandas in a
    # session pays worker fork + pandas/numpy import (~1 s), which would
    # otherwise land on whichever Arrow query sorts first and read as that
    # query's cost
    spark.range(2).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    # best-of-2 per query: the second run reuses compiled codegen, so the
    # pair separates steady-state query cost from one-time JIT/compile and
    # damps scheduler noise on a shared box
    # Fault-isolated: one broken query must never zero the whole round's
    # perf signal (r2–r4 produced no data because a single failure crashed
    # the harness). Failures are reported per-query in an `errors` map.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in sorted(bench_queries().items()):
        best = None
        try:
            for _ in range(2):
                # a query that persist()s an intermediate (e.g. the corpus
                # funnel's cached base) must not let rep 2 silently reuse
                # rep 1's cache — that reads as a warm-inflated "best" (the
                # r9 25.8 s -> 4.2 s hazard).  Clearing between reps keeps
                # the pair measuring steady-state COLD query cost while
                # still separating codegen/JIT warmup.
                spark.catalog.clearCache()
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
        except Exception as exc:  # noqa: BLE001 — isolate, record, continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        print(f"# {name}: {best:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # tolerate dataset-variant suffixes (sf1p, sf10s, ...): take the leading
    # numeric run after the last "sf"; None if there is none
    sf = None
    if "sf" in sf_dir:
        m = re.match(r"[0-9.]+", sf_dir.rstrip("/").rsplit("sf", 1)[-1])
        if m:
            try:
                sf = float(m.group(0))
            except ValueError:
                sf = None
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # ambient-load stamp: 1/5/15-min load averages + schedulable CPUs,
        # recorded so cross-round absolute comparisons can adjudicate
        # machine noise without a BENCHNOTE archaeology session (the r7→r8
        # "drift" was a 3–4 load average while this repo was idle)
        "loadavg_start": load_at_start,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "cpus_available": len(os.sched_getaffinity(0)),
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
