"""Corpus ingest/egress beyond parquet (beyond-reference scope): JSONL — the
de-facto wire format of LLM training corpora — and the balanced sharded
writer that closes the pipeline.

Scale rules encoded here:

- **Never infer schemas.** ``spark.read.json`` with inference scans the data
  twice and guesses types per-run; at 100 TB both are disqualifying. Readers
  take an explicit StructType (or reuse a reference table's schema).
- **Corrupt-record quarantine, not job failure.** One malformed line in a
  billion must not kill the read: PERMISSIVE mode routes bad lines to a
  ``_corrupt_record`` column that callers count/divert.
- **Sharded writes are hash-bucketed, never round-robin.** The shard id is a
  content-stable function of the document id (same id → same shard on every
  run and every engine), so incremental rebuilds only rewrite shards whose
  membership changed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    quarantine_corrupt: bool = True,
) -> DataFrame:
    """Schema-explicit JSONL reader. With ``quarantine_corrupt`` the result
    carries a ``_corrupt_record`` column (NULL for clean rows) instead of
    failing the job on a bad line."""
    if quarantine_corrupt:
        schema = T.StructType(
            [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt) views of a quarantining read. Spark refuses queries
    that reference ONLY ``_corrupt_record`` over a raw file scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the documented pattern is to
    materialize the parsed result first, which this helper does."""
    # cached because both returned views re-read it; intentionally NOT
    # unpersisted — the views are lazy, so reclamation is Spark's LRU
    # storage eviction (documented reliance)
    df = df.cache()
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    corrupt = df.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return clean, corrupt


def write_jsonl(df: DataFrame, path: str) -> None:
    """Line-delimited JSON egress (one object per line, one file per
    partition — the interchange format consumers expect)."""
    df.write.mode("overwrite").json(path)


def shard_column(id_col: str = "doc_id", n_shards: int = 16):
    """Content-stable shard id (md5 chars 9-16 of the id — a DIFFERENT
    substring than the train/eval split hash, so sharding and splitting
    stay statistically independent)."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 9, 8), 16, 10)
        .cast("bigint")
        % n_shards
    )


def write_sharded(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 16,
    fmt: str = "parquet",
) -> None:
    """Write the corpus as ``n_shards`` deterministic hash shards:
    ``shard=<k>/`` directories, one file per shard (repartition ON the shard
    column co-locates each shard in one task — the writer's shuffle is the
    only one). Readers prune by shard directory; incremental rebuilds
    rewrite only changed shards."""
    out = df.withColumn("shard", shard_column(id_col, n_shards))
    (
        out.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )


def read_csv_strict(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    quarantine_corrupt: bool = True,
) -> DataFrame:
    """Schema-explicit CSV reader, same contract as read_jsonl: no
    inference (inference scans twice and guesses types), PERMISSIVE mode
    with a ``_corrupt_record`` quarantine column instead of job failure,
    RFC-4180 quoting so embedded commas/quotes/newlines in text fields
    survive.  multiLine is OFF deliberately: with it, Spark cannot split
    a file across tasks (one task per file at 100 TB); the writer below
    escapes newlines instead so files stay splittable."""
    if quarantine_corrupt:
        schema = T.StructType(
            [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )


def write_csv(df: DataFrame, path: str) -> None:
    """CSV egress: headered, RFC-4180 double-quote escaping (the form the
    strict reader and every spreadsheet/warehouse loader agree on)."""
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
