"""Ordered merge of per-table change feeds (SURVEY §2.5 O1/O2, §2.9 T4).

The reference's heart is a K-way priority-heap merge: change rows from all
tables are pushed into a heapq keyed by ChangeIndex and popped in global
order up to ``common_lsn_limit`` — the min of per-table high-water marks
(``cdc_kafka/main.py:299-350``). Out-of-order production raises
(``main.py:329-331``).

Spark-first restatement: the heap is replaced by ``unionByName`` + a bounded
filter + a sort on the change-index column. Per micro-batch this is a single
Tungsten sort; at 100 TB scale the global order is produced with
``repartitionByRange`` on the index (range-partitioned, sorted within
partitions => totally ordered across partition IDs) instead of a
single-partition sort — both paths are provided.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def common_frontier(feeds: Sequence[DataFrame], idx_col: str = "change_seq"):
    """``common_lsn_limit`` = min over feeds of each feed's max index
    (main.py:299,308-309). Returns a scalar (small driver-side reduction —
    one row per feed, same as the reference's per-table frontier dict)."""
    maxes = [f.agg(F.max(idx_col).alias("m")) for f in feeds]
    u = maxes[0]
    for m in maxes[1:]:
        u = u.unionByName(m)
    row = u.agg(F.min("m").alias("frontier")).collect()[0]
    return row["frontier"]


def ordered_merge(
    feeds: Sequence[DataFrame],
    frontier,
    idx_col: str = "change_seq",
    global_rank: bool = False,
    lo=None,
) -> DataFrame:
    """Union all feeds, bound by the common frontier, order globally by the
    change index. With ``global_rank=True`` a ``global_rank`` column makes the
    total order hash-visible — computed scalably (see global_order_rank),
    never as a single-partition window. Pass ``lo`` (the known min index) to
    skip the rank's bounds pass."""
    merged = feeds[0]
    for f in feeds[1:]:
        merged = merged.unionByName(f)
    merged = merged.filter(F.col(idx_col) <= F.lit(frontier))
    if global_rank:
        bounds = (lo, frontier) if lo is not None else None
        return global_order_rank(merged, idx_col, bounds=bounds)
    return merged.orderBy(idx_col)


def global_order_rank(
    df: DataFrame,
    idx_col: str,
    buckets: int | None = None,
    bounds: tuple | None = None,
    numeric_col: str | None = None,
) -> DataFrame:
    """Dense global rank along ``idx_col`` WITHOUT a single-partition sort.

    Two-phase: (1) deterministic range-bucket each row with ``width_bucket``
    over the observed [min, max]; (2) rank within each bucket (parallel
    windows) and add the exclusive prefix count of earlier buckets (one tiny
    per-bucket count collected to the driver — bounded by bucket count, not
    data size). Equivalent to ``row_number() OVER (ORDER BY idx)`` when idx
    values are unique; survives 100 TB where the global window cannot.

    Pass ``bounds=(lo, hi)`` when the caller already knows the index range
    (e.g. from the frontier computation) to skip one extra pass over the
    data.

    ``numeric_col``: bucketing key when ``idx_col`` itself is not numeric
    (e.g. a hex-string sort key whose fixed-width numeric prefix is monotone
    in the string order). Bucket boundaries come from ``numeric_col``;
    ordering within buckets stays on ``idx_col``."""
    spark = df.sparkSession
    bucket_key = numeric_col or idx_col
    if buckets is None:
        buckets = max(spark.sparkContext.defaultParallelism, 16)
    if bounds is not None:
        lo, hi = bounds
    else:
        lo, hi = df.agg(F.min(bucket_key), F.max(bucket_key)).collect()[0]
    if lo is None:
        return df.withColumn("global_rank", F.lit(None).cast("bigint"))
    bucketed = df.withColumn(
        "__bucket",
        F.width_bucket(F.col(bucket_key), F.lit(lo), F.lit(hi) + 1, F.lit(buckets)),
    )
    counts = sorted(
        (r["__bucket"], r["n"])
        for r in bucketed.groupBy("__bucket").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for b, n in counts:
        offsets[b] = acc
        acc += n
    offset_map = F.create_map(
        *[x for b, off in offsets.items() for x in (F.lit(b), F.lit(off))]
    )
    w = Window.partitionBy("__bucket").orderBy(idx_col)
    return (
        bucketed.withColumn(
            "global_rank",
            (F.row_number().over(w) + offset_map[F.col("__bucket")]).cast("bigint"),
        )
        .drop("__bucket")
    )


def grouped_prefix_sum(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    out_col: str = "prefix_sum",
    buckets: int | None = None,
) -> DataFrame:
    """Running ``SUM(value) OVER (PARTITION BY group ORDER BY order ROWS
    UNBOUNDED PRECEDING)`` WITHOUT one window partition per group value.

    A plain window is fine when groups are numerous and small, but with few
    large groups (e.g. 3 corpus sources over 100 TB) each group's entire data
    funnels through a single task. Same two-phase trick as
    ``global_order_rank``: (1) range-bucket rows on the numeric ``order_col``
    so each (group, bucket) is a bounded slice; (2) window-sum within each
    slice in parallel and add the exclusive prefix total of the group's
    earlier buckets (a per-(group, bucket) SUM collected to the driver —
    bounded by groups x buckets, not data size)."""
    spark = df.sparkSession
    if buckets is None:
        buckets = max(spark.sparkContext.defaultParallelism, 16)
    lo, hi = df.agg(F.min(order_col), F.max(order_col)).collect()[0]
    if lo is None:
        return df.withColumn(out_col, F.lit(None).cast("bigint"))
    bucketed = df.withColumn(
        "__bucket",
        F.width_bucket(F.col(order_col), F.lit(lo), F.lit(hi) + 1, F.lit(buckets)),
    )
    totals = sorted(
        (r[group_col], r["__bucket"], r["t"])
        for r in bucketed.groupBy(group_col, "__bucket")
        .agg(F.sum(value_col).alias("t"))
        .collect()
    )
    offsets, acc = {}, {}
    for g, b, t in totals:
        offsets[(g, b)] = acc.get(g, 0)
        acc[g] = acc.get(g, 0) + t
    # offsets ship as a broadcast-joined table, not a create_map literal —
    # groups x buckets entries inlined into the plan make Catalyst analysis
    # cost scale with the offset count (measured: whole seconds at ~640)
    off_df = F.broadcast(
        spark.createDataFrame(
            [(g, b, off) for (g, b), off in offsets.items()],
            [group_col, "__bucket", "__offset"],
        )
    )
    w = (
        Window.partitionBy(group_col, "__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        bucketed.join(off_df, [group_col, "__bucket"])
        .withColumn(
            out_col,
            (F.sum(value_col).over(w) + F.col("__offset")).cast("bigint"),
        )
        .drop("__bucket", "__offset")
    )


def order_regression_check(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_col: str,
    idx_col: str,
) -> DataFrame:
    """O2/W1: count regressions of ``idx_col`` along ``order_col`` within each
    partition (validation.py:184-193). An in-order feed yields 0 everywhere."""
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    lagged = df.withColumn("__prev_idx", F.lag(idx_col).over(w))
    return (
        lagged.groupBy(*partition_cols)
        .agg(
            F.count_if(F.col("__prev_idx") > F.col(idx_col)).alias("regressions"),
            F.count("*").alias("n_rows"),
        )
    )
