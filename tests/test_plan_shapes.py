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
    "pipeline_label_margin",  # broadcast 1-row centroid-matrix array (r15 attach)
    "pipeline_corpus_build_funnel",  # 1-row×1-row scalar-count attach (r15)
    "text_tfidf_topterms",  # broadcast 1-row corpus-size aggregate (scalar join)
    "ts_user_similarity_topk",  # broadcast 1-row grid-origin scalar (t0)
    "ts_user_similarity_topk_scalable",  # same 1-row t0 broadcast; pair
    # stage is the cogrouped block kernel, not a join
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
            # partial_ (2-phase) or merge_ (multi-phase, e.g. distinct-agg
            # funnels) — both carry one row per upstream task, not the data
            assert re.search(
                r"HashAggregate\(keys=\[\], functions=\[(partial_|merge_)", child
            ), (
                f"{name}: Exchange SinglePartition over a non-scalar child "
                f"({child.strip()[:80]}) — a global sort/window funnel"
            )
        checked += 1
    assert checked >= 28


# Every hard F.broadcast() hint in the package, identified by (file, first
# token of the broadcast argument).  A hint is only legal on a relation whose
# cardinality is CONSTANT by construction (fixed dims like nation/region,
# k centroids, scalar-aggregate single rows, bounded probe/offset tables) —
# anything that scales with the data must be left to AQE's size-based
# decision, or it becomes a driver OOM at 100 TB.  Adding a new hint requires
# adding it here with a cardinality justification.
BROADCAST_ALLOWED = {
    ("operators/merge.py", "spark.createDataFrame"),  # groups×buckets offset table
    ("pipeline/clustering.py", "centroids"),  # ONE row (array of k structs)
    ("pipeline/similarity.py", "q"),  # query batch: bounded by operator contract
    ("pipeline/similarity.py", "cents_df"),  # ONE row (centroid array, r15 ivf)
    ("pipeline/similarity.py", "probes"),  # nprobe rows per query
    ("queries/pipeline2.py", "tot"),  # scalar aggregate (1 row)
    ("queries/pipeline4.py", "tot"),  # scalar aggregate (1 row)
    ("queries/pipeline2.py", "w.select"),  # one row per source domain
    ("queries/pipeline2.py", "support"),  # scalar aggregate (1 row)
    ("queries/pipeline2.py", "qs"),  # 3 literal quantile probes
    ("queries/scans.py", "bounds"),  # one row per topic partition
    ("queries/scans.py", "target"),  # scalar aggregate (1 row)
    ("queries/joins.py", "nation"),  # fixed 25 rows
    ("queries/joins.py", "region"),  # fixed 5 rows
    ("queries/analytics.py", "nation"),
    ("queries/analytics.py", "region"),
    ("queries/olap2.py", "nation"),  # fixed 25 rows
    ("queries/olap2.py", "pos"),  # scalar aggregate (1 row)
    ("queries/olap2.py", "top"),  # scalar aggregate (1 row)
    ("queries/pipeline3.py", "cents"),  # ONE row (k-centroid array, r15 semdedup)
    ("queries/pipeline5.py", "n"),  # scalar aggregate (1 row: corpus size)
    ("queries/pipeline5.py", "tot"),  # scalar aggregate (1 row: doc total)
    ("queries/olap2.py", "n1"),  # nation alias, fixed 25 rows
    ("queries/olap2.py", "n2"),  # nation alias, fixed 25 rows
    ("queries/olap2.py", "region"),  # fixed 5 rows
    ("queries/behavior.py", "base"),  # scalar aggregate (1 row: corpus t0)
    ("queries/pipeline6.py", "tot"),  # scalar aggregate (1 row)
    ("queries/pipeline6.py", "cents_df"),  # ONE row (label-centroid array, r15)
    ("queries/pipeline6.py", "u"),  # scalar aggregate (1 row: user total)
    ("queries/pipeline6.py", "nation"),  # fixed 25 rows
    ("queries/pipeline6.py", "ks"),  # 4 literal sweep points
    ("queries/pipeline6.py", "horizon"),  # scalar aggregate (1 row)
    ("queries/pipeline6.py", "t0"),  # scalar aggregate (1 row: grid origin)
    ("queries/pipeline6.py", "peak"),  # scalar aggregate (1 row: max)
    ("queries/pipeline6.py", "bf"),  # 9 literal Benford rows
    ("queries/pipeline6.py", "h"),  # scalar aggregate (1 row: horizon)
    ("queries/pipeline6.py", "q"),  # recall-audit query sample: ≤1000 rows
    # by predicate contract (vec_id % 10 == 0 AND vec_id < 10000)
    ("queries/pipeline6.py", "sp"),  # scalar aggregate (1 row: fold spread)
    ("operators/merge.py", "tot"),  # scalar aggregate (1 row: ntile row count)
    ("operators/selection.py", "tdf"),  # |groups|·|labels| target buckets —
    # bounded by the operator's low-cardinality-groups contract (r15)
}


def test_no_unconditional_broadcast_of_scaling_relations():
    """Round-5 VERDICT item 3: a hard F.broadcast on a relation whose size
    grows with the corpus (eval split, customer, supplier, lsn mapping…)
    is an at-scale driver OOM even when it is correct and fast at sf0.01.
    This pins every hint site in the package to a constant-cardinality
    allowlist so new ones can't slip in unreviewed."""
    import os

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "sqlserver_cdc_to_kafka_spark",
    )
    found = set()
    for root, _dirs, files in os.walk(pkg):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, pkg).replace(os.sep, "/")
            src = open(path).read()
            for m in re.finditer(r"F\.broadcast\(\s*([A-Za-z_][\w.]*)", src):
                found.add((rel, m.group(1)))
    unexpected = found - BROADCAST_ALLOWED
    assert not unexpected, (
        "hard F.broadcast hint on an unreviewed relation (add to "
        f"BROADCAST_ALLOWED only if constant-cardinality): {sorted(unexpected)}"
    )
