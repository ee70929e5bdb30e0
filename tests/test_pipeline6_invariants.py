"""Invariant tests for the round-6 pipeline6/behavior operators — the
properties the oracle gate can't see (it compares one run against DuckDB;
these compare runs against themselves under perturbation):

- partitioning invariance: manifests/samples/assignments must not change
  when the input is repartitioned (the "never rand(), never
  order-dependent" claim, exercised);
- internal consistency: shard manifest agrees with shard assignment;
  recall audit hits can never exceed k or the candidate count;
- BPE weighting: pair counts computed from the word vocabulary must
  equal pair counts computed from the raw token stream.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.registry import load_all


def _q(name):
    return load_all()[name].fn


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_shard_manifest_partitioning_invariant(spark, sf_dir):
    """The manifest's modular checksums are commutative sums, so any
    partitioning / evaluation order must yield identical rows."""
    base = _rows(_q("pipeline_shard_manifest")(spark, sf_dir))
    assert len(base) > 0
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(7)
    from sqlserver_cdc_to_kafka_spark.queries.pipeline6 import (
        _CKSUM_MOD,
        _MANIFEST_SHARDS,
    )

    shard = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 9, 8), 16, 10
        ).cast("bigint")
        % _MANIFEST_SHARDS
    )
    content_h = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
        "bigint"
    )
    again = _rows(
        docs.select(
            "doc_id",
            shard.alias("shard"),
            content_h.alias("content_h"),
            F.length("text").cast("bigint").alias("n_bytes"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_bytes").cast("bigint").alias("n_bytes"),
            (F.sum("content_h") % _CKSUM_MOD)
            .cast("bigint")
            .alias("content_checksum"),
            (F.sum("doc_id") % _CKSUM_MOD).cast("bigint").alias("id_checksum"),
        )
    )
    assert base == again


def test_rejection_sample_deterministic_across_runs(spark, sf_dir):
    a = _rows(_q("pipeline_rejection_sample")(spark, sf_dir))
    b = _rows(_q("pipeline_rejection_sample")(spark, sf_dir))
    assert a == b
    # audit sanity: kept can never exceed docs, expectation is within
    # bounds implied by the 0-100 coin
    for _source, n_docs, sum_q, n_kept, expected in a:
        assert 0 <= n_kept <= n_docs
        assert expected == sum_q // 100


def test_recall_audit_bounds(spark, sf_dir):
    rows = _q("ann_recall_audit")(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_hit <= 5
        assert r.n_hit <= max(r.n_candidates, 0) or r.n_candidates >= 0
        assert r.recall_ppm == r.n_hit * 1_000_000 // 5


def test_bpe_pair_counts_match_raw_stream(spark, sf_dir):
    """The vocabulary-weighted pair count must equal the count over the
    raw token stream — the compression is exact, not approximate."""
    top = {
        (r.pair, r.pair_count)
        for r in _q("pipeline_bpe_pair_counts")(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1),"
                    " i -> substring(w, i, 2))"
                )
            ).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
    )
    raw_counts = {r.pair: r.n for r in raw.collect()}
    for pair, cnt in top:
        assert raw_counts[pair] == cnt


def test_contribution_cap_bounds(spark, sf_dir):
    rows = _q("events_contribution_cap")(spark, sf_dir).collect()
    assert rows
    users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    for r in rows:
        assert r.capped_events <= r.raw_events
        # per-type capped events can never exceed cap * n_users
        assert r.capped_events <= 10 * users


def test_markov_probabilities_sum_to_one(spark, sf_dir):
    rows = _q("events_markov_transitions")(spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    by_prev = defaultdict(int)
    for r in rows:
        by_prev[r.prev_type] += r.prob_ppm
    for prev, total in by_prev.items():
        # integer floor division loses at most (n_branches - 1) ppm
        assert 1_000_000 - 25 <= total <= 1_000_000, (prev, total)


def test_threshold_sweep_cumulative_consistent(spark, sf_dir):
    rows = sorted(
        _q("dedup_threshold_sweep")(spark, sf_dir).collect(),
        key=lambda r: -r.band,
    )
    assert rows
    running = 0
    for r in rows:
        running += r.n_pairs
        assert r.n_pairs_at_or_above == running


def test_cross_source_matrix_symmetric_contract(spark, sf_dir):
    rows = _q("dedup_cross_source_matrix")(spark, sf_dir).collect()
    for r in rows:
        assert r.source_a <= r.source_b
        assert r.n_dup_pairs > 0


def test_backlog_conservation(spark, sf_dir):
    """Every order eventually closes, so the running backlog must return
    to zero after the last delta day — the interval-counting conservation
    law."""
    rows = sorted(
        _q("olap_order_backlog")(spark, sf_dir).collect(), key=lambda r: r.day
    )
    assert rows
    assert rows[-1].backlog == 0
    assert all(r.backlog >= 0 for r in rows)
    assert sum(r.n_opened for r in rows) == sum(r.n_closed for r in rows)


def test_pareto_bounds(spark, sf_dir):
    for r in _q("olap_revenue_pareto")(spark, sf_dir).collect():
        assert 1 <= r.n_for_80pct <= r.n_customers
        assert 0 < r.concentration_ppm <= 1_000_000


def test_ks_bounds(spark, sf_dir):
    rows = _q("pipeline_ks_length_drift")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.ks_ppm <= 1_000_000


def test_vocab_sweep_monotone(spark, sf_dir):
    rows = sorted(
        _q("pipeline_vocab_prune_sweep")(spark, sf_dir).collect(),
        key=lambda r: r.vocab_k,
    )
    assert len(rows) == 4
    for a, b in zip(rows, rows[1:]):
        assert b.covered_tokens >= a.covered_tokens
        assert b.coverage_ppm >= a.coverage_ppm
    assert rows[-1].coverage_ppm <= 1_000_000


def test_ts_similarity_ordering(spark, sf_dir):
    rows = _q("ts_user_similarity_topk")(spark, sf_dir).collect()
    assert len(rows) == 20
    dists = [r.dist2 for r in rows]
    assert all(d >= 0 for d in dists)
    for r in rows:
        assert r.user_a < r.user_b


def test_ts_similarity_scalable_agreement(spark, sf_dir):
    """The block-matrix scale path is EXACT, not approximate: its top-20
    must equal the dense-grid baseline's top-20 row for row (cells
    partition the pair space; per-cell local top-20 under the global
    tiebreak cannot drop a global winner)."""
    exact = [
        tuple(r) for r in _q("ts_user_similarity_topk")(spark, sf_dir).collect()
    ]
    scal = [
        tuple(r)
        for r in _q("ts_user_similarity_topk_scalable")(spark, sf_dir).collect()
    ]
    assert scal == exact


def _ts_brute_topk(rows, k=20):
    """Pure-python reference for the block-matrix kernel: dense day-grid
    vectors, all-pairs integer squared-L2, (dist2, user_a, user_b) order."""
    import numpy as np

    day = 86_400_000_000
    t0 = min(us for _, us in rows)
    nb = (max(us for _, us in rows) - t0) // day + 1
    users = sorted({u for u, _ in rows})
    idx = {u: i for i, u in enumerate(users)}
    V = np.zeros((len(users), nb), dtype=np.int64)
    for u, us in rows:
        V[idx[u], (us - t0) // day] += 1
    out = []
    for i in range(len(users)):
        for j in range(i + 1, len(users)):
            d = int(((V[i] - V[j]) ** 2).sum())
            out.append((d, users[i], users[j]))
    out.sort()
    return [(a, b, d) for d, a, b in out[:k]]


def _ts_case_to_dir(rows, tmp_path, name):
    import pandas as pd

    d = tmp_path / name
    d.mkdir()
    pdf = pd.DataFrame(
        {
            "user_id": pd.Series([u for u, _ in rows], dtype="int64"),
            "ts": pd.Series(
                pd.to_datetime([us for _, us in rows], unit="us")
            ).astype("datetime64[us]"),
        }
    )
    pdf.to_parquet(d / "events.parquet")
    return str(d)


def test_ts_similarity_scalable_equals_brute_force_on_adversarial_cases(
    spark, tmp_path
):
    """The kernel's exactness claim, exercised off the fixture distribution:
    all-ties (every dist2 identical — pure tiebreak), fewer pairs than k,
    a single user (empty result), duplicate vectors (dist2 = 0 winners),
    and two seeded random corpora with empty days and uneven activity."""
    import random

    day = 86_400_000_000
    cases = {
        # 25 identical one-event-per-day users: all pair distances equal
        "ties": [(u, d * day + 500) for u in range(1, 26) for d in range(4)],
        # 5 users -> only 10 pairs (fewer than k)
        "few": [(u, (u % 3) * day + u * 1000) for u in range(1, 6)],
        "single": [(7, 123), (7, day + 5), (7, 3 * day)],
        # users 1 and 2 identical, 3 and 4 identical: dist2=0 pairs first
        "dups": (
            [(1, d * day + 9) for d in (0, 2, 5)]
            + [(2, d * day + 77) for d in (0, 2, 5)]
            + [(3, day + 1), (4, day + 2)]
            + [(5, 4 * day + 3), (5, 4 * day + 4)]
        ),
    }
    for seed in (11, 42):
        rng = random.Random(seed)
        cases[f"rand{seed}"] = [
            (rng.randrange(1, 40), rng.randrange(0, 45 * day))
            for _ in range(600)
        ]
    fn = _q("ts_user_similarity_topk_scalable")
    for name, rows in cases.items():
        sf_dir = _ts_case_to_dir(rows, tmp_path, name)
        got = [tuple(r) for r in fn(spark, sf_dir).collect()]
        want = _ts_brute_topk(rows)
        assert got == want, f"case {name}: {got[:3]} != {want[:3]}"


def test_ts_similarity_scalable_tile_size_invariance(
    spark, tmp_path, monkeypatch
):
    """The row-tiled cell evaluation (round-9 sf10 OOM fix) is pure memory
    shaping: results must be identical at ANY tile size.  The default tile
    (1024 rows) makes every test-scale cell single-tile, so this pins the
    multi-tile path explicitly — per-tile 20th-smallest threshold, boundary
    -tie retention (the all-ties case floods every tile with equal dist2),
    sentinel masking on the diagonal cell, and tiles with zero valid pairs
    (single-user corpus).  Tile sizes 1 and 3 force 1-row and ragged-edge
    tiles; B=1 forces one giant diagonal cell so tiling does all the work."""
    import random

    from sqlserver_cdc_to_kafka_spark.queries import pipeline6

    day = 86_400_000_000
    cases = {
        "ties": [(u, d * day + 500) for u in range(1, 26) for d in range(4)],
        "few": [(u, (u % 3) * day + u * 1000) for u in range(1, 6)],
        "single": [(7, 123), (7, day + 5), (7, 3 * day)],
        "dups": (
            [(1, d * day + 9) for d in (0, 2, 5)]
            + [(2, d * day + 77) for d in (0, 2, 5)]
            + [(3, day + 1), (4, day + 2)]
            + [(5, 4 * day + 3), (5, 4 * day + 4)]
        ),
        "rand11": [
            (rng.randrange(1, 40), rng.randrange(0, 45 * day))
            for rng in [random.Random(11)]
            for _ in range(600)
        ],
    }
    fn = _q("ts_user_similarity_topk_scalable")
    for name, rows in cases.items():
        sf_dir = _ts_case_to_dir(rows, tmp_path, f"tile_{name}")
        want = _ts_brute_topk(rows)
        for tile, blocks in ((3, 1), (1, 2), (4, 8)):
            monkeypatch.setattr(pipeline6, "_TS_SIM_TILE", tile)
            monkeypatch.setattr(pipeline6, "_TS_SIM_BLOCKS", blocks)
            got = [tuple(r) for r in fn(spark, sf_dir).collect()]
            assert got == want, f"case {name} tile={tile} B={blocks}"


def test_ts_similarity_scalable_adaptive_block_count(spark, sf_dir, monkeypatch):
    """B scales as max(knob, ceil(users/target)): shrinking the per-block
    target must raise the cell count without changing the result — the
    adaptive-B job is pure partitioning, like the block knob itself."""
    from sqlserver_cdc_to_kafka_spark.queries import pipeline6

    base = [
        tuple(r)
        for r in _q("ts_user_similarity_topk_scalable")(spark, sf_dir).collect()
    ]
    # sf0.001 has ~hundreds of users; target=16 forces the adaptive branch
    # (B = ceil(U/16) > the knob's 8) through the same code the 100x probe
    # exercises at 150k users.
    monkeypatch.setattr(pipeline6, "_TS_SIM_BLOCK_TARGET", 16)
    alt = [
        tuple(r)
        for r in _q("ts_user_similarity_topk_scalable")(spark, sf_dir).collect()
    ]
    assert alt == base


def test_ts_similarity_scalable_block_count_invariance(spark, sf_dir, monkeypatch):
    """Hash-blocking is pure partitioning: the top-20 must be identical
    under any block count (cells always partition the pair space)."""
    from sqlserver_cdc_to_kafka_spark.queries import pipeline6

    base = [
        tuple(r)
        for r in _q("ts_user_similarity_topk_scalable")(spark, sf_dir).collect()
    ]
    monkeypatch.setattr(pipeline6, "_TS_SIM_BLOCKS", 3)
    alt = [
        tuple(r)
        for r in _q("ts_user_similarity_topk_scalable")(spark, sf_dir).collect()
    ]
    assert alt == base


def test_ts_similarity_scalable_plan_has_no_pairwise_join(spark, sf_dir):
    """Round-6 VERDICT item 3: the scale variant must not self-join on the
    day bucket (a ~30-value skewed key materializing O(U²·days) rows).
    Its pair stage must be the cogrouped block kernel; the only joins in
    the plan are the 1-row t0 scalar broadcasts."""
    plan = (
        _q("ts_user_similarity_topk_scalable")(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapCoGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" not in plan


def test_embedding_drift_cosine_range(spark, sf_dir):
    rows = _q("pipeline_embedding_drift")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.centroid_cos <= 1.0
        assert r.n_train_vecs > 0 and r.n_eval_vecs >= 0


def test_coreset_fps_distances_non_increasing(spark, sf_dir):
    """k-center greedy invariant: each newly chosen point's selection
    distance (max-min dist at choice time) can never exceed the previous
    one — min-distances only shrink as centers are added."""
    rows = sorted(
        _q("pipeline_coreset_fps")(spark, sf_dir).collect(),
        key=lambda r: r.center_rank,
    )
    assert len(rows) == 8
    assert rows[0].sel_dist2 == 0
    dists = [r.sel_dist2 for r in rows[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:]))
    assert len({r.vec_id for r in rows}) == 8  # all distinct centers


def test_kmv_estimate_sanity(spark, sf_dir):
    """KMV bounds: small groups report exact counts; estimator stays
    within a loose multiplicative band of the exact distinct."""
    for r in _q("sketch_bottomk_distinct")(spark, sf_dir).collect():
        if r.exact_distinct < 32:
            assert r.kmv_estimate == r.exact_distinct
        else:
            assert 0.3 * r.exact_distinct <= r.kmv_estimate <= 3 * r.exact_distinct


def test_bounce_rate_consistency(spark, sf_dir):
    (r,) = _q("events_bounce_rate")(spark, sf_dir).collect()
    assert 0 <= r.n_bounces <= r.n_sessions
    assert r.bounce_ppm == r.n_bounces * 1_000_000 // r.n_sessions
    assert r.max_session_events >= 1


def test_abc_parts_partition(spark, sf_dir):
    """A/B/C classes partition the part set and revenue ordering holds:
    A-revenue >= B-revenue >= C-revenue per part on average."""
    rows = {r.abc_class: r for r in _q("olap_abc_parts")(spark, sf_dir).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    if "B" in rows and rows["B"].n_parts and rows["A"].n_parts:
        assert (
            rows["A"].class_cents / rows["A"].n_parts
            >= rows["B"].class_cents / rows["B"].n_parts
        )


def test_decile_migration_marginals(spark, sf_dir):
    """Every migrating customer appears exactly once in the matrix."""
    rows = _q("olap_decile_migration")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.from_q <= 5 and 1 <= r.to_q <= 5
        assert r.n_customers > 0


def test_sampling_bias_uplift_nonnegative(spark, sf_dir):
    """Quality-proportional sampling can only raise (or hold) the mean
    quality of the kept set — negative uplift means the coin is
    mis-wired."""
    rows = _q("pipeline_sampling_bias_audit")(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_kept <= r.n_all
        assert r.uplift_x100 >= 0, r


def test_activity_streaks_bounds(spark, sf_dir):
    rows = _q("events_activity_streaks")(spark, sf_dir).collect()
    assert rows
    total_users = sum(r.n_users for r in rows)
    import pyspark.sql.functions as F_

    users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert total_users == users  # every user has exactly one max streak
    assert all(1 <= r.max_streak <= 31 for r in rows)
