"""pipeline_domain_mixture's n_target floor is order-independent.

The temperature-mixture weight z = SUM(pow(n_total, alpha)) is a float sum,
so its low bits vary with Spark's partial-aggregation combine order.  With
EQUAL source counts, corpus_n * budget * weight is analytically an exact
integer, and before the r12 fix those order-dependent bits decided the
FLOOR: n_sampled flapped by 1-2 between otherwise-identical full sf0.1
sweeps.  The fix snaps the product to 6 decimals before flooring (summation
noise ~1e-10 absolute, 5000x inside the snap window), mirrored in the
DuckDB oracle.

This test builds the worst case — every source the same size, so every
n_target sits exactly on the boundary — and pins the analytic value across
shuffle-partition counts (different partition counts exercise different
combine orders).
"""

import pytest
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.queries.pipeline2 import (
    _MIX_ALPHA,
    _MIX_BUDGET,
    q_domain_mixture,
)

N_SOURCES = 8
DOCS_PER_SOURCE = 250


@pytest.fixture()
def boundary_corpus(spark, tmp_path):
    # equal counts => weight = 1/N exactly (analytically) and
    # n_target = corpus_n * budget / N = 2000 * 0.5 / 8 = 125 exactly
    rows = [
        (s * DOCS_PER_SOURCE + i, f"src_{s}", "x", "train")
        for s in range(N_SOURCES)
        for i in range(DOCS_PER_SOURCE)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, source string, text string, split string"
    )
    path = str(tmp_path / "documents.parquet")
    df.write.mode("overwrite").parquet(path)
    return str(tmp_path)


def test_equal_count_boundary_is_exact_and_order_independent(
    spark, boundary_corpus
):
    expected_target = int(
        N_SOURCES * DOCS_PER_SOURCE * _MIX_BUDGET / N_SOURCES
    )  # 125; with equal counts the weight is 1/N for ANY (finite) alpha
    assert _MIX_ALPHA > 0
    orig_sp = spark.conf.get("spark.sql.shuffle.partitions")
    results = {}
    try:
        for sp in ("2", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", sp)
            rows = sorted(
                (r["source"], r["n_target"], r["n_sampled"])
                for r in q_domain_mixture(spark, boundary_corpus).collect()
            )
            assert all(t == expected_target for _, t, _ in rows), (sp, rows)
            results[sp] = rows
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig_sp)
    # identical realized sample regardless of combine order
    assert results["2"] == results["7"] == results["32"]
