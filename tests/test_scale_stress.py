"""10–20× scale-stress probes for the operators whose 100 TB story is a
specific algorithmic claim (env-gated: SPARK_GRAFT_SCALE_STRESS=1 — several
minutes of wall clock, not part of the default suite).

Each probe replicates the sf0.1 tables in memory with remapped keys (no
files written) and checks an EXACT invariant at the larger scale, so the
claim is measured, not argued:

- ``global_order_rank``: dense total order over 1M rows without any
  single-partition sort — rank must be a permutation of [1..N] and agree
  with the prefix-count of the index at arbitrary split points.
- ``minhash_lsh_candidate_pairs``: identical-text replicas have identical
  signatures, so ALL C(R,2) replica pairs per original must surface as
  candidates (exact-duplicate recall is 1.0 by construction) — on a 100k-doc
  corpus, 950,000 required pairs.
- ``exact_group_kth``: with every value replicated R times, the k-th
  smallest of the replicated multiset equals the ceil(k/R)-th smallest of
  the original — cross-checked against DuckDB on the original table.

Run:  SPARK_GRAFT_SCALE_STRESS=1 python -m pytest tests/test_scale_stress.py -q -s
"""

from __future__ import annotations

import math
import os
import time

import duckdb
import pytest
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.operators.merge import global_order_rank
from sqlserver_cdc_to_kafka_spark.operators.selection import exact_group_kth
from sqlserver_cdc_to_kafka_spark.pipeline.dedup import minhash_lsh_candidate_pairs

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE_STRESS"),
    reason="scale stress is opt-in: SPARK_GRAFT_SCALE_STRESS=1",
)

SF_DIR = "/root/testdata/sf0.1"


def _replicate(df, id_col: str, factor: int):
    """factor copies of every row, ids remapped to id*factor+r (unique)."""
    r = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__r")
    return (
        df.select("*", r)
        .withColumn(id_col, F.col(id_col) * factor + F.col("__r"))
        .drop("__r")
    )


def test_global_order_rank_permutation_at_1m(spark):
    ev = _replicate(spark.read.parquet(f"{SF_DIR}/events.parquet"), "event_id", 10)
    n = ev.count()
    t0 = time.time()
    ranked = global_order_rank(ev, "event_id").select("event_id", "global_rank")
    stats = ranked.agg(
        F.count("*").alias("n"),
        F.min("global_rank").alias("lo"),
        F.max("global_rank").alias("hi"),
        F.count_distinct("global_rank").alias("d"),
    ).collect()[0]
    print(f"\nglobal_order_rank over {n} rows: {time.time() - t0:.1f}s")
    assert (stats["n"], stats["lo"], stats["hi"], stats["d"]) == (n, 1, n, n)
    # rank agrees with the index's prefix counts at arbitrary split points
    for frac in (0.1, 0.5, 0.9):
        x = ranked.approxQuantile("event_id", [frac], 0.0)[0]
        below = ranked.filter(F.col("event_id") <= x)
        agg = below.agg(F.count("*").alias("c"), F.max("global_rank").alias("m")).collect()[0]
        assert agg["c"] == agg["m"]


def test_minhash_lsh_exact_dup_recall_at_100k_docs(spark):
    R = 20
    docs = _replicate(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text"),
        "doc_id",
        R,
    )
    n_orig = docs.count() // R
    t0 = time.time()
    cand = minhash_lsh_candidate_pairs(docs, "doc_id")
    same_orig = cand.filter(
        (F.col("doc_a") / R).cast("bigint") == (F.col("doc_b") / R).cast("bigint")
    ).count()
    print(f"minhash LSH over {n_orig * R} docs: {time.time() - t0:.1f}s")
    # identical text -> identical signature -> collide in every band:
    # every one of the C(R,2) replica pairs per original must be a candidate
    assert same_orig == n_orig * R * (R - 1) // 2


def test_exact_group_kth_matches_original_order_statistics(spark):
    R = 10
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "event_type", F.floor(F.col("value") * 1e6).cast("bigint").alias("v")
    )
    big = _replicate(ev, "event_id", R)
    t0 = time.time()
    got = exact_group_kth(
        big,
        "event_type",
        "v",
        {
            "median": lambda n: (n + 1) // 2,
            "p90": lambda n: math.ceil(0.9 * n),
        },
    )
    print(f"exact_group_kth over {R}x events: {time.time() - t0:.1f}s")
    con = duckdb.connect()
    for group, n, vals in got:
        n_orig = n // R
        assert n == n_orig * R
        for label, rank_fn in (
            ("median", lambda m: (m + 1) // 2),
            ("p90", lambda m: math.ceil(0.9 * m)),
        ):
            k_big = rank_fn(n)
            k_orig = math.ceil(k_big / R)  # value repeated R times consecutively
            want = con.execute(
                f"""
                SELECT v FROM (
                  SELECT CAST(floor(value * 1e6) AS BIGINT) AS v
                  FROM '{SF_DIR}/events.parquet' WHERE event_type = ?
                ) ORDER BY v OFFSET {k_orig - 1} LIMIT 1
                """,
                [group],
            ).fetchone()[0]
            assert vals[label] == want, (group, label, vals[label], want)
