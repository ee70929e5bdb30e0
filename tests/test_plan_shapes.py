"""Physical-plan shape regression tests for every bench-flagged query.

The scale discipline PLANS.md documents, enforced in CI: a headline query
must never pick up a cartesian product, and the only single-partition
exchanges allowed are scalar-aggregate funnels (map-side partials reduce
the data before one task sees it). Broadcast nested-loop joins are legal
only for the queries that intentionally broadcast a tiny side (ANN query
sets, IVF centroids, interval tables, literal quantile probes).
"""

from __future__ import annotations

import re

from sqlserver_cdc_to_kafka_spark.registry import load_all

# queries whose plan intentionally contains BroadcastNestedLoopJoin —
# a small broadcast side by construction
BNLJ_ALLOWED = {
    "ann_cosine_topk",  # broadcast query-vector set vs corpus scan
    "ann_ivf_topk",  # broadcast centroids (cluster assignment)
    "join_range_version_intervals",  # broadcast 1-row max-point fold
    "sketch_quantile_histogram",  # broadcast 3-row quantile probes
    "pipeline_kmeans_centroids",  # broadcast k-row centroid matrix (assignment pass)
}


def test_bench_plans_have_no_scale_antipatterns(spark, sf_dir):
    checked = 0
    for name, q in sorted(load_all().items()):
        if not q.bench:
            continue
        plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        if "BroadcastNestedLoopJoin" in plan:
            assert name in BNLJ_ALLOWED, (
                f"{name}: unexpected BroadcastNestedLoopJoin — broadcast of "
                "a non-tiny side, or a missing equi-key"
            )
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" not in line:
                continue
            # the child (next plan line) must be a partial SCALAR aggregate:
            # the funnel then carries one row per map task, not the data
            child = lines[i + 1] if i + 1 < len(lines) else ""
            assert re.search(r"HashAggregate\(keys=\[\], functions=\[partial_", child), (
                f"{name}: Exchange SinglePartition over a non-scalar child "
                f"({child.strip()[:80]}) — a global sort/window funnel"
            )
        checked += 1
    assert checked >= 28
