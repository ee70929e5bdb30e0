"""Bucketed co-located join (SURVEY §4 partitioning row; the 100 TB recipe
for repeated fact-fact joins): pre-bucketing both tables by the join key
removes the per-query shuffle entirely — verify via the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.tables import load_table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    # spark.sql.warehouse.dir is static config — use the session default
    # (./spark-warehouse, gitignored) and drop the tables afterwards
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load_table(spark, sf_dir, "orders").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    ).write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_lineitem")
    yield None
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    # disable broadcast so the join strategy choice is bucketing's to win
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"), "o_orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: zero shuffle
        # and it actually runs correctly
        n = joined.count()
        want = (
            spark.table("b_lineitem")
            .join(F.broadcast(spark.table("b_orders")), "o_orderkey")
            .count()
        )
        assert n == want > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_unbucketed_join_does_shuffle(spark, sf_dir, warehouse):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        orders = load_table(spark, sf_dir, "orders")
        plan = (
            li.join(orders, "o_orderkey")._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in plan  # the shuffle bucketing removes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
