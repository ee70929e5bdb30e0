"""Isolated per-query bench: a FRESH JVM/session per repetition.

bench.py times all headline queries inside one shared session, so as the
bench set grows, later/repeat rounds accumulate JVM state (code cache,
broadcast cleanup, GC pressure) that reads as per-query "drift" even when
plans are unchanged.  This tool adjudicates such drift (round-7 VERDICT
task 3): each repetition forks a clean interpreter, builds a fresh session,
applies the same warm-up bench.py uses (parquet footer + Arrow worker
pool), and times the query best-of-2 — numbers here are the query's true
steady-state cost, free of shared-session history.

    python tools/bench_isolated.py NAME [NAME...] [--reps 3] [--sf DIR]

Prints one JSON line: {"sf": ..., "reps": N, "queries": {name: {"runs":
[...], "best": s, "median": s}}}.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _default_driver_memory() -> str:
    # deferred import: pulls pyspark transitively, which the argparse-only
    # paths (e.g. --help) shouldn't pay for
    from sqlserver_cdc_to_kafka_spark.session import DEFAULT_DRIVER_MEMORY

    return DEFAULT_DRIVER_MEMORY

_CHILD = """
import json, sys, time
sys.path.insert(0, {repo!r})
from sqlserver_cdc_to_kafka_spark.registry import load_all
from sqlserver_cdc_to_kafka_spark.session import get_spark

name, sf_dir, cpus, sp, runs = {name!r}, {sf_dir!r}, {cpus}, {sp}, {runs}
spark = get_spark("bench-isolated", cpus=cpus, shuffle_partitions=sp)
spark.read.parquet(f"{{sf_dir}}/region.parquet").count()
spark.range(2).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
    "overwrite"
).save()
fn = load_all()[name].fn
best = None
for _ in range(runs):
    # same honesty rule as bench.py: queries that persist() an intermediate
    # (caller-managed lazy-return caches, e.g. pagerank's edge list) must
    # not let run 2 silently reuse run 1's blocks - the warm "best" would
    # measure the cache, not the query
    spark.catalog.clearCache()
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print("BENCH_ISOLATED_RESULT " + json.dumps(best))
"""


def run_one(
    name: str, sf_dir: str, cpus: int, sp: int | None = None, runs: int = 2
) -> float:
    code = _CHILD.format(
        repo=REPO, name=name, sf_dir=sf_dir, cpus=cpus, sp=sp or cpus, runs=runs
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=False
    )
    # round-8 ADVICE: check=True swallowed the child's stderr inside
    # CalledProcessError — surface it on BOTH failure paths (non-zero exit
    # and zero exit without a result line)
    if out.returncode != 0:
        raise RuntimeError(
            f"{name}: child exited {out.returncode}:\n{out.stderr[-2000:]}"
        )
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_ISOLATED_RESULT "):
            return float(json.loads(line.split(" ", 1)[1]))
    raise RuntimeError(f"{name}: no result line in child output:\n{out.stderr[-2000:]}")


def main() -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="*")
    p.add_argument(
        "--all-bench",
        action="store_true",
        help="run every bench=True query from the registry (the r9 sf1 "
        "full-decade protocol) instead of naming them individually",
    )
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.add_argument(
        "--runs-per-jvm",
        type=int,
        default=2,
        help="timed executions per child JVM; the reported time is their "
        "min (best-of-N). Use 1 for disk-bounded heavies: shuffle files "
        "from run 1 are reclaimed lazily (ContextCleaner waits for JVM "
        "GC), so two back-to-back ~20 GB-shuffle runs coexist on disk — "
        "at sf100 dedup_two_stage died on no-space at runs=2 and passes "
        "single-run on the same box (measured)",
    )
    p.add_argument(
        "--shuffle-partitions",
        type=int,
        default=None,
        help="override spark.sql.shuffle.partitions (default: --cpus). "
        "Partition count must scale with DATA, not cores: at sf100 "
        "(600M-row lineitem) 32 partitions is ~19M rows / >1 GB per sort "
        "task against a 250 MB/core budget — the sorts spill their whole "
        "input and the spill files exceeded the box's free disk "
        "(measured: join_range_version_intervals died SPILL_OUT_OF_MEMORY"
        "/no-space at sp=32, runs clean at sp=256, ~120 MB/partition — "
        "the sizing a real cluster deployment would use)",
    )
    args = p.parse_args()
    if args.all_bench:
        from sqlserver_cdc_to_kafka_spark.registry import bench_queries

        args.names = sorted(set(args.names) | set(bench_queries()))
    if not args.names:
        p.error("give query NAMEs or --all-bench")

    # ambient load is read BEFORE the runs: the benchmark inflates its own
    # 1-min average, so a post-run read would always show a "busy" box
    load_at_start = [round(x, 2) for x in os.getloadavg()]
    report: dict[str, dict] = {}
    for name in args.names:
        runs = []
        try:
            for i in range(args.reps):
                dt = run_one(
                    name, args.sf, args.cpus, args.shuffle_partitions, args.runs_per_jvm
                )
                runs.append(round(dt, 3))
                print(f"# {name} rep{i + 1}: {dt:.3f}s", file=sys.stderr)
        except RuntimeError as exc:
            # a dead child is DATA for a scale probe (the sf100 failures at
            # 150 MB/core were the round's real findings) — record it and
            # keep probing the rest instead of aborting the whole batch
            report[name] = {"error": str(exc)[:500], "runs": runs}
            print(f"# {name} FAILED: {str(exc)[:200]}", file=sys.stderr)
            continue
        report[name] = {
            "runs": runs,
            "best": min(runs),
            "median": round(statistics.median(runs), 3),
        }
    # ambient-load stamp (round-8 VERDICT task 3): absolute timings on a
    # shared box are only adjudicable across rounds if the artifact records
    # what else the machine was doing
    out = {
        "sf": args.sf,
        "reps": args.reps,
        "runs_per_jvm": args.runs_per_jvm,
        "shuffle_partitions": args.shuffle_partitions or args.cpus,
        # memory per task slot = heap * 0.6 unified / cpus; at sf100 the 8g
        # default (150 MB/slot) OOM'd two queries that run clean at a
        # deployment-realistic 96g (3 GB/slot) — record which one ran.
        # The fallback is the session module's constant, not a re-hardcode,
        # so the stamp can't drift from what the child JVM actually got
        "driver_memory": os.environ.get(
            "SPARK_DRIVER_MEMORY", _default_driver_memory()
        ),
        "loadavg_start": load_at_start,
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "cpus_available": len(os.sched_getaffinity(0)),
        "queries": report,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
