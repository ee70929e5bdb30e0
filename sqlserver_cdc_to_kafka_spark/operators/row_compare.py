"""Row-by-row DB↔topic comparator (§5 validator 2,
``cdc_kafka/row_comparison_validator.py:183-347``).

The reference replays the change table and the Kafka topic side-by-side in
change-index order, reporting blocks of mismatched rows and missing delete
tombstones. Distributed restatement: a full outer join on the change index —
each side scanned once, mismatches detected by column comparison, no
sequential replay. Consecutive mismatches group into blocks with the
standard gaps-and-islands trick on the index order."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_diff(
    expected: DataFrame,
    actual: DataFrame,
    idx_col: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Per-row comparison result keyed by the change index: status ∈
    {match, mismatch, missing_in_actual, missing_in_expected} plus the first
    differing column (diagnostic, as the reference prints)."""
    e = expected.select(
        F.col(idx_col).alias("idx"),
        *[F.col(c).alias(f"e_{c}") for c in compare_cols],
        F.lit(True).alias("in_e"),
    )
    a = actual.select(
        F.col(idx_col).alias("idx"),
        *[F.col(c).alias(f"a_{c}") for c in compare_cols],
        F.lit(True).alias("in_a"),
    )
    joined = e.join(a, "idx", "full_outer")
    first_diff = F.lit(None).cast("string")
    any_diff = F.lit(False)
    for c in reversed(compare_cols):
        neq = ~F.col(f"e_{c}").eqNullSafe(F.col(f"a_{c}"))
        first_diff = F.when(neq, F.lit(c)).otherwise(first_diff)
        any_diff = any_diff | neq
    status = (
        F.when(F.col("in_e").isNull(), "missing_in_expected")
        .when(F.col("in_a").isNull(), "missing_in_actual")
        .when(any_diff, "mismatch")
        .otherwise("match")
    )
    return joined.select(
        "idx", status.alias("status"), first_diff.alias("first_diff_col")
    )


_NUMERIC_TYPES = {
    "tinyint", "smallint", "int", "bigint", "float", "double", "date",
    "timestamp", "timestamp_ntz",
}


def _order_prefix_num(idx: Column) -> Column:
    """Monotone numeric prefix of a string/binary index: the first 6 bytes
    read as a big-endian integer (< 2^48 — width_bucket computes bounds in
    DOUBLE, so the key must stay inside double's exact-integer range 2^53).
    Spark compares strings by UTF-8 byte order, so the prefix never inverts
    the idx ordering — exactly what a range-bucketing key needs (ties within
    a shared prefix just share a bucket; in-bucket ordering stays on idx)."""
    raw = F.substring(F.encode(idx.cast("string"), "UTF-8"), 1, 6)
    return F.coalesce(F.conv(F.hex(raw), 16, 10).cast("bigint"), F.lit(0))


def mismatch_blocks(diff: DataFrame) -> DataFrame:
    """Group consecutive non-matching indexes into blocks
    (row_comparison_validator.py:148-180's report shape): block start/end
    index + row count per block. Gaps-and-islands: island id = rank over all
    non-matches minus rank within the ordered sequence.

    Both ranks are bucketed range ranks (``global_order_rank``), never a
    single-partition ``row_number`` window — the full diff is specced at
    1 M+ rows per topic and must rank in parallel. Non-numeric change
    indexes (e.g. hex LSN strings) are bucketed on a monotone 7-byte numeric
    prefix; ordering within buckets stays on the index itself. The diff is
    cached and its range computed once, shared by both rank passes, so the
    upstream comparison join is not re-run per rank action."""
    from sqlserver_cdc_to_kafka_spark.operators.merge import global_order_rank

    numeric = dict(diff.dtypes).get("idx") in _NUMERIC_TYPES
    num_col = None
    if not numeric:
        diff = diff.withColumn("__idx_num", _order_prefix_num(F.col("idx")))
        num_col = "__idx_num"
    # persisted: the bounds collect below plus BOTH rank passes of the
    # returned lazy plan read `diff`; the cache must outlive this function,
    # so release is caller-managed — Spark's LRU storage eviction reclaims
    # it under pressure, and long sessions can clearCache() between queries
    # (same documented reliance as pipeline/clustering.py)
    diff = diff.persist()
    key = num_col or "idx"
    lo, hi = diff.agg(F.min(key), F.max(key)).collect()[0]
    bounds = (lo, hi)
    all_ranked = global_order_rank(
        diff, "idx", bounds=bounds, numeric_col=num_col
    ).withColumnRenamed("global_rank", "rn_all")
    bad = all_ranked.filter(F.col("status") != "match")
    bad_ranked = global_order_rank(
        bad, "idx", bounds=bounds, numeric_col=num_col
    ).withColumnRenamed("global_rank", "rn_bad")
    return (
        bad_ranked.withColumn("island", F.col("rn_all") - F.col("rn_bad"))
        .groupBy("island")
        .agg(
            F.min("idx").alias("block_start"),
            F.max("idx").alias("block_end"),
            F.count("*").alias("n_rows"),
        )
        .drop("island")
    )
