"""Validate operators/skew.salted_join under measured skew (r10 surplus).

The r10 skew probes found no registered heavy needing salting (their
shuffles are combine-safe), so the remedy itself had no measured witness.
This probe manufactures the one shape that DOES need it — a sort-merge
equi-join of the skewed events table (hot user = 9.6% of rows) against a
per-user dimension too big to broadcast (simulated with a merge-join hint)
— and times three configurations in fresh JVMs:

  aqe_skew   AQE on (engine default): runtime skew-join splitting
  plain      AQE off: the deterministic-plan straggler case
  salted     AQE off + salted_join(salt_factor=8)

    python tools/salted_join_probe.py --sf .localdata/sf10s

Prints one JSON line with wall seconds and the join stage's max/median
active-task ms per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import glob, json, os, statistics, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sqlserver_cdc_to_kafka_spark.session import get_spark
from sqlserver_cdc_to_kafka_spark.operators.skew import salted_join

mode, sf_dir, cpus = {mode!r}, {sf_dir!r}, {cpus}
evdir = tempfile.mkdtemp(prefix="evlog-")
spark = get_spark(
    "salted-join-probe", cpus=cpus, shuffle_partitions=cpus,
    extra_conf={{
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": "file:" + evdir,
        "spark.eventLog.compress": "false",
        **({{}} if mode == "aqe_skew" else {{"spark.sql.adaptive.enabled": "false"}}),
    }},
)
ev = spark.read.parquet(f"{{sf_dir}}/events.parquet").select("user_id", "value")
dim = ev.select("user_id").distinct().withColumn(
    "attr", (F.col("user_id") % 97).cast("double")
)
ev.limit(1).count()  # warm parquet footer + workers
if mode == "salted":
    joined = salted_join(ev, dim.hint("merge"), ["user_id"], salt_factor=8)
else:
    joined = ev.join(dim.hint("merge"), "user_id")
t0 = time.time()
row = joined.agg(F.sum(F.col("attr") * F.col("value")).alias("s"),
                 F.count("*").alias("n")).collect()[0]
wall = time.time() - t0
spark.stop()
stages = {{}}
for p in (q for q in glob.glob(evdir + "/**/*", recursive=True) if os.path.isfile(q)):
    for line in open(p):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        if e.get("Event") == "SparkListenerTaskEnd" and not (e.get("Task Info") or {{}}).get("Failed"):
            m = e.get("Task Metrics") or {{}}
            srm = m.get("Shuffle Read Metrics") or {{}}
            recs = (m.get("Input Metrics") or {{}}).get("Records Read", 0) + srm.get("Total Records Read", 0)
            stages.setdefault(e["Stage ID"], []).append((m.get("Executor Run Time", 0), recs))
# the join stage = the stage with the largest total task time that READ
# shuffle records (excludes scans)
cand = {{sid: ts for sid, ts in stages.items() if sum(r for _, r in ts) > 0}}
res = {{"mode": mode, "wall_sec": round(wall, 2), "rows": row["n"],
       "checksum": round(row["s"], 2)}}
if cand:
    sid = max(cand, key=lambda s: sum(t for t, _ in cand[s]))
    active = [t for t, r in cand[sid] if r > 0]
    res.update(join_stage_tasks=len(active), max_task_ms=max(active),
               median_task_ms=statistics.median(active),
               ratio=round(max(active) / statistics.median(active), 2))
else:
    # no stage read shuffle records (e.g. a future plan broadcasts the dim
    # despite the merge hint) — keep the wall-clock numbers we DID measure
    # instead of dying and losing the whole mode to a stderr blob
    res.update(join_stage_tasks=0, max_task_ms=None,
               median_task_ms=None, ratio=None)
print("SALTED_PROBE_RESULT " + json.dumps(res))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".localdata/sf10s")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    out = {"sf": args.sf, "cpus": args.cpus,
           "loadavg_start": [round(x, 2) for x in os.getloadavg()], "modes": {}}
    for mode in ("aqe_skew", "plain", "salted"):
        code = _CHILD.format(repo=REPO, mode=mode, sf_dir=args.sf, cpus=args.cpus)
        r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
        if r.returncode != 0:
            out["modes"][mode] = {"error": r.stderr[-500:]}
            continue
        for line in r.stdout.splitlines():
            if line.startswith("SALTED_PROBE_RESULT "):
                out["modes"][mode] = json.loads(line.split(" ", 1)[1])
        print(f"# {mode}: {out['modes'].get(mode)}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
