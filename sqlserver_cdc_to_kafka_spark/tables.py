"""Test-table loading (the driver's synthetic TPC-H-ish tables, TESTDATA.md).

These parquet tables stand in for the reference's SQL Server source tables
(SURVEY.md §1.1); `documents` / `embeddings` back the beyond-reference
LLM-pipeline operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan with Catalyst pushdown/pruning intact — never wrap this
    in anything that would block filter pushdown to the parquet reader.

    ``events.ts`` dtype varies by testdata vintage: today it is parquet
    TIMESTAMP micros (Spark reads TIMESTAMP or TIMESTAMP_NTZ); historically
    it was TIMESTAMP(NANOS), which ``nanosAsLong`` (kept set, a no-op on
    micros) surfaces as LongType epoch-nanos. NEVER assume one form — always
    go through ``functions.datetime_fns`` (epoch_micros / as_event_time),
    which dispatches on the actual column dtype."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ensure_parallel(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Spread a narrow scan across the cluster before CPU-heavy per-row work
    (shingling, hashing, vector math).

    The driver's test tables are single small parquet files — one row group,
    so Spark scans each with ONE task and every downstream map runs serially
    no matter how the joins are arranged. At 100 TB the input is thousands of
    files and this is a no-op (partitions >= cores already); the check makes
    the repartition a small-input-only cost, never a second shuffle of a big
    corpus."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for the SQL API path."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
