"""Pins for operators/skew.chunked_trailing_agg (r10 alpha-1.5 remedy).

The chunked trailing window must be BIT-IDENTICAL to the single-partition
window on every input shape, including the one that breaks naive chunking:
a key whose consecutive rows straddle EMPTY buckets (the carry must hop to
the key's next existing bucket, not to bucket+1)."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.operators.skew import chunked_trailing_agg

_N_PREC = 4


def _plain(df):
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-_N_PREC, Window.currentRow)
    )
    return df.select(
        "user_id",
        "event_id",
        F.sum("v").over(w).alias("__sum"),
        F.count("*").over(w).alias("__cnt"),
    )


def _chunked(df, chunk_us):
    out = chunked_trailing_agg(
        df.withColumn("__bucket", F.floor(F.col("us") / chunk_us)),
        "user_id",
        ["us", "event_id"],
        "v",
        _N_PREC,
        "__bucket",
    )
    return out.select("user_id", "event_id", "__sum", "__cnt")


def _assert_equal(a, b):
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_chunked_equals_plain_on_random_streams(spark):
    rng = random.Random(7)
    rows = [
        (u, i, rng.randrange(0, 10_000), rng.randrange(-50, 50))
        for u in range(20)
        for i in range(rng.randrange(1, 60))
    ]
    df = spark.createDataFrame(
        [(u, u * 100_000 + i, us, v) for u, i, us, v in rows],
        "user_id long, event_id long, us long, v long",
    )
    for chunk in (100, 1_000, 7_000):  # many tiny, medium, few big buckets
        _assert_equal(_plain(df), _chunked(df, chunk))


def test_chunked_carry_hops_empty_buckets(spark):
    # one user, rows only in buckets 0 and 5 (chunk=100): the frame of the
    # first bucket-5 row must still see the last 4 bucket-0 rows
    rows = [(1, i, i, 1) for i in range(6)]  # us 0..5 -> bucket 0
    rows += [(1, 100 + i, 550 + i, 1) for i in range(3)]  # bucket 5
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, us long, v long"
    )
    _assert_equal(_plain(df), _chunked(df, 100))
    got = {
        r["event_id"]: (r["__sum"], r["__cnt"])
        for r in _chunked(df, 100).collect()
    }
    assert got[100] == (5, 5)  # 4 carried bucket-0 rows + itself


def test_chunked_single_row_and_all_one_bucket(spark):
    df = spark.createDataFrame(
        [(1, 1, 42, 7), (2, 2, 10, 1), (2, 3, 11, 2)],
        "user_id long, event_id long, us long, v long",
    )
    _assert_equal(_plain(df), _chunked(df, 1_000_000))
    _assert_equal(_plain(df), _chunked(df, 1))


def test_assert_chunk_monotone_flags_interleaved_bucketing(spark):
    from sqlserver_cdc_to_kafka_spark.operators.skew import (
        _assert_chunk_monotone,
    )

    df = spark.createDataFrame(
        [(1, 1, 10, 1), (1, 2, 20, 1), (1, 3, 30, 1)],
        "user_id long, event_id long, us long, v long",
    )
    # good: bucket derived from the leading order column
    good = df.withColumn("__bucket", F.floor(F.col("us") / 15))
    _assert_chunk_monotone(good, "user_id", ["us", "event_id"], "__bucket")
    # bad: bucket interleaves with stream order (descending in us)
    bad = df.withColumn("__bucket", -F.col("us"))
    try:
        _assert_chunk_monotone(bad, "user_id", ["us", "event_id"], "__bucket")
    except ValueError as exc:
        assert "monotone" in str(exc)
    else:
        raise AssertionError("interleaved bucketing not flagged")
