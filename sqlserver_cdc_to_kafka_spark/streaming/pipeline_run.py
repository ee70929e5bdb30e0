"""End-to-end pipeline run — the reference's hot loop (§3.1, main.py:203-353)
composed from the engine's parts:

per cycle: snapshot pages interleave with change micro-batches (T7) →
tombstones appended after deletes (T6) → batch + progress committed together
(T2, manifest transaction) → metrics observed in-job and reported (A9/X2) →
self-validation over the engine's own committed output (§5's validators as
product).

This is pull-mode (bounded feeds) — the test harness shape; the same
composition drives ``readStream`` sources unchanged."""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.streaming.change_feed import (
    MicroBatcher,
    with_tombstones,
)
from sqlserver_cdc_to_kafka_spark.streaming.metrics import (
    ReporterBase,
    observed_batch,
    report_batch,
)
from sqlserver_cdc_to_kafka_spark.streaming.sinks import TransactionalDirSink
from sqlserver_cdc_to_kafka_spark.streaming.snapshot_stream import SnapshotStream


@dataclass
class PipelineRun:
    """Drive one table's snapshot + change feed to completion against a
    transactional sink, reporting metrics per batch."""

    spark: SparkSession
    source_table: DataFrame
    change_feed: DataFrame
    key_cols: list[str]
    sink: TransactionalDirSink
    reporters: list[ReporterBase] = field(default_factory=list)
    batch_size: int = 2000
    batches_committed: int = 0
    rows_committed: int = 0

    def run(self) -> int:
        """Interleave snapshot pages with change micro-batches, as the
        reference fills the gap between CDC polls with snapshot work
        (main.py:214-267). Returns total rows committed (snapshot rows +
        change rows + tombstones)."""
        snap = SnapshotStream(self.source_table, self.key_cols, self.batch_size)
        mb = MicroBatcher(
            self.change_feed,
            self.sink.topic,
            batch_size=self.batch_size,
            sink=self._commit_changes,
        )
        resume = self.sink.last_progress()
        if resume is not None:
            mb._offset = resume
        while True:
            page = snap.next_page()
            if page is not None:
                self._commit(self._snapshot_envelope(page), None)
                page.unpersist()
            emitted = mb.run_once()
            if snap.completed and emitted < self.batch_size:
                return self.rows_committed

    # -- internals ---------------------------------------------------------

    def _snapshot_envelope(self, page: DataFrame) -> DataFrame:
        # same output schema as the tombstoned change batches (one sink)
        cols = self.change_feed.columns
        out = page
        for c in cols:
            if c not in page.columns:
                dt = self.change_feed.schema[c].dataType
                if c == "__operation":
                    out = out.withColumn(c, F.lit(0))
                else:
                    out = out.withColumn(c, F.lit(None).cast(dt))
        return out.select(*cols).withColumn("__tombstone", F.lit(False))

    def _commit_changes(self, batch: DataFrame, batch_id: int) -> None:
        self._commit(with_tombstones(batch, self.key_cols), batch_id)

    def _commit(self, batch: DataFrame, _batch_id) -> int:
        observed, obs = observed_batch(batch)
        t0 = time.time()
        pos_row = observed.agg(F.max("change_seq")).collect()[0]
        n = self.sink.commit_batch(observed, self.batches_committed, pos_row[0])
        if not n:
            return 0
        m = report_batch(obs.get, self.batches_committed, time.time() - t0, self.reporters)
        self.batches_committed += 1
        self.rows_committed += m.rows
        return m.rows


def foreach_batch_writer(sink: TransactionalDirSink, idx_col: str = "change_seq"):
    """The production binding (§3.1 Spark restatement): a foreachBatch
    function committing every micro-batch through the transactional sink.
    Spark's checkpoint provides replay; the sink's batch-id idempotence makes
    the replay exactly-once (T2) — the pair is the reference's
    data+progress Kafka transaction."""

    def write(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        pos = batch.agg(F.max(idx_col)).collect()[0][0]
        sink.commit_batch(batch, batch_id, pos)

    return write
