"""Replayer: apply a change feed onto a target table (merge/upsert sink).

Reference: ``cdc_kafka/replayer.py`` consumes a table's Kafka topic and
materializes it back into SQL Server: per-batch it keeps only the LAST
operation per key (``replayer.py:499-525``), applies deletes first via a
set-based join-delete (``replayer.py:372-379``), then a MERGE upsert
(``replayer.py:387-416``).

Spark mapping (SURVEY §2.3 J5/J6, §2.7 W5): last-per-key via
``max_by(struct, offset)`` (one shuffle with map-side combine), deletes as a
``left_anti`` join, upserts as an outer-join-coalesce — the pure-DataFrame
MERGE emulation (in a Delta deployment this is `MERGE INTO` inside
``foreachBatch``). All joins are on the key, so pre-bucketing the target by
key makes the apply shuffle-free at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.model.envelope import OP_DELETE
from sqlserver_cdc_to_kafka_spark.operators.compaction import last_value_per_key


def replay_merge(
    target: DataFrame,
    feed: DataFrame,
    key_cols: Sequence[str],
    order_col: str = "change_seq",
    op_col: str = "__operation",
) -> DataFrame:
    """Final state of ``target`` after applying ``feed``:

    - dedupe feed to last op per key (W5);
    - keys whose last op is Delete are removed (J5 anti-join);
    - other keys upsert: matched rows take feed values, unmatched feed keys
      insert (J6 merge).
    """
    value_cols = [c for c in target.columns if c not in key_cols]
    last = last_value_per_key(feed, key_cols, order_col, drop_deleted=False, op_col=op_col)
    deletes = last.filter(F.col(op_col) == OP_DELETE).select(*key_cols)
    upserts = last.filter(F.col(op_col) != OP_DELETE).select(
        *key_cols,
        F.lit(True).alias("__matched"),
        *[F.col(c).alias(f"__u_{c}") for c in value_cols],
    )

    survivors = target.join(deletes, list(key_cols), "left_anti")
    # WHEN MATCHED THEN UPDATE: take the feed's value even if it is NULL —
    # a plain coalesce would silently keep stale target values.
    merged = survivors.join(upserts, list(key_cols), "left").select(
        *key_cols,
        *[
            F.when(F.col("__matched"), F.col(f"__u_{c}")).otherwise(F.col(c)).alias(c)
            for c in value_cols
        ],
    )
    # not-matched-by-target inserts (MERGE ... WHEN NOT MATCHED THEN INSERT)
    inserts = (
        upserts.join(target.select(*key_cols), list(key_cols), "left_anti")
        .join(deletes, list(key_cols), "left_anti")
        .select(*key_cols, *[F.col(f"__u_{c}").alias(c) for c in value_cols])
    )
    return merged.unionByName(inserts)


def set_reconciliation(
    snapshot_keys: DataFrame,
    inserted_keys: DataFrame,
    deleted_keys: DataFrame,
    actual: DataFrame,
) -> DataFrame:
    """A8 (``cdc_kafka/validation.py:258-285``): expected live-row count =
    |snapshot ∪ inserted − deleted| compared against the actual table. All
    inputs are single-(composite-)key DataFrames with identical column names.
    Pure set algebra — distributed ``union``/``except``/``distinct``."""
    expected = (
        snapshot_keys.union(inserted_keys).distinct().exceptAll(deleted_keys.distinct())
    )
    e = expected.agg(F.count("*").alias("expected_count"))
    a = actual.agg(F.count("*").alias("actual_count"))
    return e.crossJoin(a).select(
        "expected_count",
        "actual_count",
        (F.col("expected_count") == F.col("actual_count")).alias("is_match"),
    )
