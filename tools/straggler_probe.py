"""Per-stage straggler probe: max/median task time under skewed data.

The r9 verdict's last untested scale axis: all three measured decades
replicated keys uniformly, so every shuffle had balanced partitions by
construction.  This tool runs one query per fresh child JVM with Spark's
event log enabled, then parses the log into per-stage task-time and
shuffle-read distributions — the straggler signal wall-clock time hides.
A stage whose max/median task time exceeds ~4 on skewed data is a hot-key
victim (one task drags the stage while its siblings idle); on a real
1000-executor cluster that ratio IS the stage's wasted parallelism.

    python tools/straggler_probe.py --sf .localdata/sf10s NAME [NAME...]

Prints one JSON line per run:
  {"sf": ..., "queries": {name: {"wall_sec": s, "straggler_ratio": r,
   "worst_stage": {...}, "stages": [top-N by max task time]}}}

The per-stage rows carry n_tasks, max/median/total executor run time,
max/median shuffle-read bytes, and the stage name's first line (the
operator anchor).  `straggler_ratio` is the max time ratio over stages
that are big enough to matter (max task >= 1 s, >= 4 tasks) — trivial
stages produce meaningless ratios (a 3 ms task vs a 1 ms median).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CHILD = """
import glob, json, sys, time
sys.path.insert(0, {repo!r})
from sqlserver_cdc_to_kafka_spark.registry import load_all
from sqlserver_cdc_to_kafka_spark.session import get_spark

name, sf_dir, cpus, sp, evdir = {name!r}, {sf_dir!r}, {cpus}, {sp}, {evdir!r}
spark = get_spark(
    "straggler-probe",
    cpus=cpus,
    shuffle_partitions=sp,
    extra_conf={{
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": "file:" + evdir,
        # uncompressed: the parse below reads it back line-by-line
        "spark.eventLog.compress": "false",
    }},
)
spark.read.parquet(f"{{sf_dir}}/region.parquet").count()
spark.range(2).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
    "overwrite"
).save()
fn = load_all()[name].fn
t0 = time.time()
fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
wall = time.time() - t0
spark.stop()  # flush the event log

stages = {{}}  # stage_id -> dict
# Spark 4 writes an eventlog_v2_* DIRECTORY with events_* files inside
import os as _os
paths = [
    p
    for p in glob.glob(evdir + "/**/*", recursive=True)
    if _os.path.isfile(p)
]
for path in paths:
    for line in open(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages.setdefault(si["Stage ID"], {{}})["name"] = si.get(
                "Stage Name", ""
            ).split("\\n")[0][:120]
        elif ev.get("Event") == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            info = ev.get("Task Info") or {{}}
            if info.get("Failed"):
                continue
            m = ev.get("Task Metrics") or {{}}
            srm = m.get("Shuffle Read Metrics") or {{}}
            im = m.get("Input Metrics") or {{}}
            st = stages.setdefault(sid, {{}})
            st.setdefault("run_ms", []).append(m.get("Executor Run Time", 0))
            st.setdefault("sread", []).append(
                srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
            )
            st.setdefault("recs", []).append(
                im.get("Records Read", 0) + srm.get("Total Records Read", 0)
            )
print("STRAGGLER_RESULT " + json.dumps({{"wall": wall, "stages": stages}}))
"""


def run_one(
    name: str, sf_dir: str, cpus: int, sp: int, timeout: int | None = None
) -> dict:
    with tempfile.TemporaryDirectory(prefix="evlog-") as evdir:
        code = _CHILD.format(
            repo=REPO, name=name, sf_dir=sf_dir, cpus=cpus, sp=sp, evdir=evdir
        )
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            # a query that can't finish on skewed data IS the probe's
            # finding — record it without letting it hold the box hostage
            raise RuntimeError(f"{name}: timed out after {timeout}s")
    if out.returncode != 0:
        raise RuntimeError(
            f"{name}: child exited {out.returncode}:\n{out.stderr[-2000:]}"
        )
    for line in out.stdout.splitlines():
        if line.startswith("STRAGGLER_RESULT "):
            return json.loads(line.split(" ", 1)[1])
    raise RuntimeError(f"{name}: no result line:\n{out.stderr[-2000:]}")


def summarize(raw: dict, top: int = 6) -> dict:
    rows = []
    for sid, st in raw["stages"].items():
        run_ms = st.get("run_ms") or []
        if not run_ms:
            continue
        sread = st.get("sread") or [0]
        recs = st.get("recs") or [0] * len(run_ms)
        med = statistics.median(run_ms)
        # the skew verdict uses ACTIVE tasks only: a single-file scan hands
        # most byte-range splits zero row groups, and those ~0 ms empty
        # tasks poison the median (a uniform dataset measured "ratio 229"
        # from 11 empty splits out of 15 before this filter existed)
        active = [t for t, r in zip(run_ms, recs) if r > 0] or run_ms
        amed = statistics.median(active)
        rows.append(
            {
                "stage": int(sid),
                "name": st.get("name", ""),
                "n_tasks": len(run_ms),
                "n_active": len(active),
                "max_ms": max(run_ms),
                "median_ms": round(med, 1),
                "total_ms": sum(run_ms),
                "time_ratio": round(max(active) / amed, 2) if amed > 0 else None,
                "max_records": max(recs),
                "median_active_records": statistics.median(
                    [r for r in recs if r > 0] or [0]
                ),
                "max_shuffle_read_mb": round(max(sread) / 1e6, 1),
                "median_shuffle_read_mb": round(
                    statistics.median(sread) / 1e6, 1
                ),
            }
        )
    rows.sort(key=lambda r: -r["max_ms"])
    # straggler verdict only over stages big enough for the ratio to mean
    # anything: one 1.2 s task vs a 0.3 s median among 4 tasks is noise
    big = [
        r
        for r in rows
        if r["max_ms"] >= 1000 and r["n_active"] >= 4 and r["time_ratio"]
    ]
    worst = max(big, key=lambda r: r["time_ratio"], default=None)
    return {
        "wall_sec": round(raw["wall"], 2),
        "straggler_ratio": worst["time_ratio"] if worst else None,
        "worst_stage": worst,
        "stages": rows[:top],
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("names", nargs="+")
    p.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    p.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument(
        "--timeout",
        type=int,
        default=None,
        help="kill a child after N seconds and record the timeout as the "
        "query's result (a non-finishing query is the finding, not a "
        "reason to hang the probe)",
    )
    args = p.parse_args()
    sp = args.shuffle_partitions or args.cpus

    load_at_start = [round(x, 2) for x in os.getloadavg()]
    report: dict[str, dict] = {}
    for name in args.names:
        try:
            raw = run_one(name, args.sf, args.cpus, sp, args.timeout)
        except RuntimeError as exc:
            report[name] = {"error": str(exc)[:500]}
            print(f"# {name} FAILED: {str(exc)[:200]}", file=sys.stderr)
            continue
        report[name] = summarize(raw)
        print(
            f"# {name}: wall={report[name]['wall_sec']}s "
            f"straggler_ratio={report[name]['straggler_ratio']}",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "sf": args.sf,
                "cpus": args.cpus,
                "shuffle_partitions": sp,
                "loadavg_start": load_at_start,
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                "queries": report,
            }
        )
    )


if __name__ == "__main__":
    main()
