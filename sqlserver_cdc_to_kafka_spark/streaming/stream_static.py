"""Stream-static joins: a live stream joined against a static (batch)
relation — the Structured Streaming capability behind "dedup the incoming
batch against the corpus fingerprint store" at ingest time.

Spark recomputes/reuses the static side per micro-batch with no state store
involvement (stateless join), so the pattern scales to an arbitrarily long
stream: state never grows, and the static side can be a bucketed/broadcast
fingerprint table maintained incrementally. The reference has no streaming
joins at all (SURVEY §2.9 closing note) — this is beyond-reference scope
proven end-to-end against a batch oracle.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.streaming.windows import drained


def incremental_dedup_stream_drain(
    spark: SparkSession,
    incoming: DataFrame,
    corpus_fps: DataFrame,
    fp_col: str = "fp",
    files: int = 4,
) -> DataFrame:
    """Drive the ingest-dedup stream end-to-end with availableNow and return
    the drained NEW (non-duplicate) rows as a batch DataFrame.

    ``incoming`` is staged to disk as ``files`` parquet files (so the file
    micro-batch source yields several triggers — each one a stream-static
    anti join), LEFT ANTI joined per micro-batch against the static
    ``corpus_fps`` fingerprint relation, and appended to a parquet sink.
    Stateless: nothing accumulates in the state store or the driver."""
    scratch = os.path.join(tempfile.gettempdir(), f"ssjoin_{uuid.uuid4().hex[:12]}")
    src = os.path.join(scratch, "src")
    outdir = os.path.join(scratch, "out")
    ckpt = os.path.join(scratch, "ckpt")

    incoming.repartition(files).write.parquet(src)
    schema = spark.read.parquet(src).schema

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    new_rows = stream.join(corpus_fps, on=fp_col, how="left_anti")
    q = (
        new_rows.writeStream.format("parquet")
        .option("path", outdir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return drained(spark.read.parquet(outdir), scratch)
