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

# Host-speed sentinels (round-12 VERDICT task 3): queries whose physical
# plans have been frozen for many rounds, timed with the SAME protocol as
# the headline loop (clearCache + best-of-2) in the same session right
# before it.  The emitted host_factor = median(measured / pinned) captures
# both boot-to-boot CPU variance and ambient load AT BENCH TIME, so a
# BENCH_r*.json adjudicates itself instead of needing an after-the-fact
# BENCHNOTE/BENCHBAND archaeology session (the r11/r12 recurring dispute).
# Pin provenance:
# - val_topic_summary: UNCHANGED since the r13 re-pin (BENCH_r13_local.json
#   host_sentinels, sentinel position, clean session at loadavg 0.57) — its
#   plan has been byte-frozen throughout and it is the CONTINUITY ANCHOR
#   across the r16 discontinuity below.
# - cdc_ordered_merge / dedup_two_stage: RE-PINNED in r16 (round-15 VERDICT
#   task 1 — the freeze was costing real bench headroom, so both queries
#   were optimized this round and their plans are frozen anew from here).
#   New pins = the BENCH_r16_local.json sentinel-position measurements
#   (2.292 / 2.324 at val-ratio 1.086/1.025 = 1.0595) NORMALIZED to the r13
#   reference session via the val anchor (2.292/1.0595 = 2.163,
#   2.324/1.0595 = 2.194), so all three pins still describe the same
#   reference host speed.  host_factor values from r13-r15 and from r16+
#   remain mutually comparable through the val anchor; the per-sentinel
#   RATIOS for the two re-pinned queries are NOT comparable across the
#   r15->r16 boundary (their plans changed — see BENCHBAND_r16.json).
# Measured in sentinel position (right after the two minimal warmups),
# best-of-2.  Only meaningful at the default sf0.1 scale — at other SF
# dirs the factor is emitted as null.
_SENTINELS_SF01 = {
    "cdc_ordered_merge": 2.163,
    "dedup_two_stage": 2.194,
    "val_topic_summary": 1.025,
}


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

    # host-speed sentinels: measured before the headline loop, same
    # protocol, compared against the pinned clean-boot values above
    host_sentinels: dict[str, float] = {}
    host_factor = None
    if os.path.basename(sf_dir.rstrip("/")) == "sf0.1":
        from sqlserver_cdc_to_kafka_spark.registry import load_all

        reg = load_all()
        for name, pinned in _SENTINELS_SF01.items():
            try:
                best = None
                for _ in range(2):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    reg[name].fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                host_sentinels[name] = round(best, 3)
            except Exception as exc:  # noqa: BLE001 — factor is advisory
                print(f"# sentinel {name}: FAILED {exc}", file=sys.stderr)
        if host_sentinels:
            ratios = sorted(
                host_sentinels[n] / _SENTINELS_SF01[n] for n in host_sentinels
            )
            # true median: with an even count (a sentinel failed), picking
            # ratios[len//2] would take the UPPER middle — biased high
            # exactly when the signal is thinnest (round-13 ADVICE)
            mid = len(ratios) // 2
            med = (
                ratios[mid]
                if len(ratios) % 2
                else (ratios[mid - 1] + ratios[mid]) / 2
            )
            host_factor = round(med, 3)
            print(
                f"# host_factor {host_factor} (sentinels {host_sentinels})",
                file=sys.stderr,
            )

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
        # self-adjudication: this boot+session's speed vs the pinned clean
        # r11 stamp, measured by frozen-plan sentinels (see _SENTINELS_SF01)
        "host_factor": host_factor,
        "host_sentinels": host_sentinels or None,
        "host_sentinel_reference": (
            "BENCH_r13_local.json host_sentinels (sentinel-position best-of-2, "
            "clean session, loadavg 0.57) — position-symmetric since r14; "
            "factors from rounds <=13 used r11 headline-loop pins"
            if host_factor is not None
            else None
        ),
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
