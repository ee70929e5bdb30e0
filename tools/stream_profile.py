"""Per-micro-batch cost breakdown for the streaming drain queries.

r16 (round-15 VERDICT task 2): before touching the heavy streaming
witnesses (stream_stream_attribution_outer ~27 s, stream_heavy_hitters_cms
~13 s) commit a breakdown of WHERE each drain's time goes — trigger
planning vs state-store commit vs data — so the optimization attacks what
actually dominates.

A StreamingQueryListener captures every QueryProgressEvent fired inside the
query function (the drains run their streaming query internally and return
a batch DataFrame), so no engine code changes for profiling. Per batch we
keep the durationMs map (triggerExecution / queryPlanning / addBatch /
getBatch / latestOffset / walCommit / commitOffsets), input rows, and the
state-operator metrics (rows total/updated/removed, commit time, memory).

    python tools/stream_profile.py NAME [NAME...] [--sf DIR] [--json PATH]

Prints one JSON line per query; --json writes the full artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from pyspark.sql.streaming import StreamingQueryListener

    from sqlserver_cdc_to_kafka_spark.registry import load_all
    from sqlserver_cdc_to_kafka_spark.session import get_spark

    spark = get_spark("stream-profile", cpus=args.cpus, shuffle_partitions=args.cpus)
    spark.read.parquet(f"{args.sf}/region.parquet").count()

    progress: list[dict] = []

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802
            pass

        def onQueryProgress(self, event):  # noqa: N802
            progress.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    spark.streams.addListener(_L())
    reg = load_all()
    out: dict[str, dict] = {}
    for name in args.names:
        progress.clear()
        t0 = time.time()
        df = reg[name].fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 3)
        # listener delivery is async — wait for the event queue to drain
        deadline = time.time() + 10
        last = -1
        while time.time() < deadline and len(progress) != last:
            last = len(progress)
            time.sleep(0.5)
        batches = []
        for p in progress:
            batches.append(
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": p.get("durationMs"),
                    "stateOperators": [
                        {
                            k: so.get(k)
                            for k in (
                                "operatorName",
                                "numRowsTotal",
                                "numRowsUpdated",
                                "numRowsRemoved",
                                "commitTimeMs",
                                "memoryUsedBytes",
                                "numShufflePartitions",
                            )
                        }
                        for so in p.get("stateOperators", [])
                    ],
                }
            )
        summary = {
            "wall_s": wall,
            "n_batches": len(batches),
            "trigger_total_ms": sum(
                b["durationMs"].get("triggerExecution", 0) for b in batches
            ),
            "addBatch_total_ms": sum(
                b["durationMs"].get("addBatch", 0) for b in batches
            ),
            "planning_total_ms": sum(
                b["durationMs"].get("queryPlanning", 0) for b in batches
            ),
            "stateCommit_total_ms": sum(
                so["commitTimeMs"] or 0
                for b in batches
                for so in b["stateOperators"]
            ),
            "batches": batches,
        }
        out[name] = summary
        print(
            json.dumps(
                {
                    "name": name,
                    **{k: v for k, v in summary.items() if k != "batches"},
                }
            )
        )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
