"""Partition-count invariance: results must not depend on how the data is
shuffled. Catches order-dependent aggregations (collect_list without a
sort, first()/last() without ordering, float reduction order leaking into
rounded outputs) — the class of bug that passes every fixed-config test and
then corrupts results the day the cluster is resized.
"""

from __future__ import annotations

import pytest

from sqlserver_cdc_to_kafka_spark.registry import load_all

# Representative order-sensitive query shapes: list-collecting merges,
# banded candidate generation, iterative float aggregation, prefix sums,
# window packing.
QUERIES = [
    "cdc_ordered_merge",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "pipeline_kmeans_centroids",
    "pipeline_pack_sequences",
    "pipeline_shard_assignment",
    # round-6 order-sensitive shapes: unpartitioned ntile, integer-mass
    # iteration, ROWS-frame sums, per-source rank windows, group-explode
    # candidate pairing
    "olap_customer_value_deciles",
    "graph_pagerank_bipartite",
    "events_moving_sum",
    "pipeline_score_rank_normalize",
    "dedup_edit_distance_verify",
]


def _fingerprint(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_shuffle_partition_count(spark, sf_dir, name):
    q = load_all()[name]
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        a = _fingerprint(q.fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _fingerprint(q.fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert len(a) > 0
    assert a == b, f"{name}: result depends on shuffle partitioning"
