"""Deterministic distributed sketches: count-min and HyperLogLog.

The streaming-analytics staples for frequency and cardinality at 100 TB,
built so the SAME sketch comes out of any engine: every hash is an
md5-derived integer (no engine-native hash functions, no RNG), so a DuckDB
oracle reproduces the sketch bit-for-bit and the driver's hash-exact gate
applies to an *approximate* structure.

- **Count-min**: ``depth`` md5 hash rows x ``width`` counters. Building it
  is one explode(depth) + groupBy((depth, bucket)) — map-side combine makes
  the shuffle at most depth x width rows per partition regardless of input
  size. Point estimate = min over rows of the counter at that row's bucket;
  always >= the true count (property-tested).
- **HyperLogLog**: 60-bit md5 value split bucket/rank; rank = trailing
  zeros + 1 via the integer-exact ``bit_count((v & -v) - 1)`` identity (no
  float log2 — engines disagree on its exactness at power-of-two
  boundaries). Registers are ``MAX(rank) GROUP BY bucket`` — one shuffle of
  at most ``buckets`` rows per partition; sketches merge by the same MAX,
  which is what makes HLL distributable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 256
HLL_BUCKETS = 64  # 6 index bits; 54-bit rank domain; empty-rank sentinel 55


def _cms_bucket(depth_col, item_col):
    """Row-``depth`` hash bucket of an item: md5('<d>:<item>') first 8 hex
    digits mod width — identical arithmetic in any engine."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(depth_col.cast("string"), F.lit(":"), item_col)),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % CMS_WIDTH
    )


def count_min_counters(df: DataFrame, item_col: str) -> DataFrame:
    """(depth, bucket, count) — the CMS counter table for a stream of
    items."""
    inst = df.select(F.col(item_col).alias("item")).withColumn(
        "depth", F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1)))
    )
    return (
        inst.withColumn("bucket", _cms_bucket(F.col("depth"), F.col("item")))
        .groupBy("depth", "bucket")
        .agg(F.count("*").alias("count"))
    )


def count_min_estimates(df: DataFrame, item_col: str) -> DataFrame:
    """(item, exact_count, cms_estimate): every distinct item's true count
    next to its CMS point estimate (min over depth rows of the hashed
    counter). estimate >= exact always — collisions only inflate."""
    counters = count_min_counters(df, item_col)
    exact = (
        df.select(F.col(item_col).alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("exact_count"))
    )
    probes = exact.withColumn(
        "depth", F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1)))
    ).withColumn("bucket", _cms_bucket(F.col("depth"), F.col("item")))
    return (
        probes.join(counters, ["depth", "bucket"])
        .groupBy("item", "exact_count")
        .agg(F.min("count").cast("bigint").alias("cms_estimate"))
    )


def hll_registers(df: DataFrame, item_col: str) -> DataFrame:
    """(bucket, register) — the HyperLogLog register table. Merge two
    sketches (or two partitions' partials) with MAX per bucket."""
    hv = F.conv(F.substring(F.md5(F.col(item_col)), 1, 15), 16, 10).cast(
        "bigint"
    )
    r = df.select(
        (hv % HLL_BUCKETS).alias("bucket"),
        F.shiftright(hv, 6).alias("v"),
    )
    rank = F.expr(
        "CASE WHEN v = 0 THEN 55 ELSE bit_count((v & -v) - 1) + 1 END"
    )
    return (
        r.withColumn("rank", rank)
        .groupBy("bucket")
        .agg(F.max("rank").cast("int").alias("register"))
    )


def hll_estimate(registers) -> float:
    """Driver-side cardinality estimate from a collected register table:
    standard HLL harmonic mean (m=HLL_BUCKETS) with the small-range
    linear-counting correction (raw <= 2.5m with empty buckets — the
    Flajolet et al. regime where raw HLL overshoots ~2x)."""
    import math

    regs = {r["bucket"]: r["register"] for r in registers}
    m = HLL_BUCKETS
    alpha = 0.709  # alpha_64
    s = sum(2.0 ** -regs.get(b, 0) for b in range(m))
    raw = alpha * m * m / s
    empty = m - len(regs)
    if raw <= 2.5 * m and empty > 0:
        return m * math.log(m / empty)
    return raw
