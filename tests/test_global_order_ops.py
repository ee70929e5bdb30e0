"""Equality pins for the r11 scalable global-order helpers
(operators/merge.global_prefix_sum / global_ntile / global_gap_islands):
each must be BIT-IDENTICAL to its single-partition-window equivalent — the
plan shape changes (range-bucketed, parallel), the results must not."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.operators.merge import (
    global_gap_islands,
    global_ntile,
    global_prefix_sum,
)


def _assert_same(a, b):
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_global_prefix_sum_matches_window_with_ties(spark):
    rng = random.Random(11)
    # heavy ties in the leading order component — the tie-break (k) must
    # make the running sum deterministic and identical on both paths
    rows = [(i, rng.randrange(0, 40), rng.randrange(-9, 10)) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long, x long")
    w = (
        Window.orderBy(F.col("v").desc(), "k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    plain = df.select("k", F.sum("x").over(w).cast("bigint").alias("cum"))
    fast = global_prefix_sum(
        df, [(-F.col("v")).alias("nv"), F.col("k")], (-F.col("v")).cast("double"), "x", "cum", buckets=7
    ).select("k", "cum")
    _assert_same(plain, fast)


def test_global_ntile_matches_ntile_across_residues(spark):
    # n % k residues 0..k-1 and n < k all exercised
    for n, k in [(10, 4), (11, 4), (13, 4), (12, 4), (3, 10), (97, 10), (100, 3)]:
        df = spark.createDataFrame([(i, i * 7 % n) for i in range(n)], "id long, s long")
        w = Window.orderBy("s", "id")
        plain = df.select("id", F.ntile(k).over(w).cast("bigint").alias("t"))
        fast = global_ntile(
            df, [F.col("s"), F.col("id")], F.col("s").cast("double"), k, "t", buckets=5
        ).select("id", "t")
        _assert_same(plain, fast)


def test_global_gap_islands_matches_window_sessionize(spark):
    rng = random.Random(5)
    ts, t = [], 0
    for _ in range(400):
        t += rng.choice([1, 2, 3, 50, 0])  # 0 => tied timestamps
        ts.append(t)
    df = spark.createDataFrame([(i, x) for i, x in enumerate(ts)], "id long, us long")
    w = Window.orderBy("us")
    plain = (
        df.withColumn("__prev", F.lag("us").over(w))
        .withColumn(
            "brk",
            (F.col("__prev").isNull() | (F.col("us") - F.col("__prev") >= 10)).cast("int"),
        )
        .withColumn(
            "island",
            F.sum("brk").over(
                Window.orderBy("us").rangeBetween(Window.unboundedPreceding, 0)
            ).cast("bigint"),
        )
        .select("id", "island")
    )
    fast = global_gap_islands(df, "us", 10, "island", buckets=9).select("id", "island")
    _assert_same(plain, fast)
