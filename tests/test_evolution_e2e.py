"""Schema-evolution end-to-end (SURVEY §1.3, §2.9 T9/T11): a new capture
instance arrives with a changed schema; the decision tree drives either a
continue-in-place or a full re-snapshot, and the pipeline executes it."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.fixtures.cdc_events import cdc_events
from sqlserver_cdc_to_kafka_spark.plans.evolution import (
    ddl_change_requires_new_snapshot,
    make_column_probe,
    schema_checksum,
)
from sqlserver_cdc_to_kafka_spark.streaming.metrics import AccumulatingReporter
from sqlserver_cdc_to_kafka_spark.streaming.pipeline_run import PipelineRun
from sqlserver_cdc_to_kafka_spark.streaming.sinks import (
    TransactionalDirSink,
    reset_progress,
)
from sqlserver_cdc_to_kafka_spark.tables import load_table


def test_capture_instance_switch_with_resnapshot(spark, sf_dir, tmp_path):
    # v1 instance: orders WITHOUT o_orderpriority (old schema)
    orders_v1 = load_table(spark, sf_dir, "orders").drop("o_orderpriority")
    feed_v1 = cdc_events(spark, sf_dir).drop("o_orderpriority")
    sink = TransactionalDirSink(str(tmp_path / "out"), "orders")
    run1 = PipelineRun(
        spark, orders_v1, feed_v1, ["o_orderkey"], sink,
        [AccumulatingReporter()], batch_size=800,
    )
    run1.run()
    assert "o_orderpriority" not in sink.read_committed(spark).columns

    # v2 instance: the column exists and CARRIES DATA -> decision tree says
    # the stream cannot just continue (we never captured that data)
    orders_v2 = load_table(spark, sf_dir, "orders")
    assert schema_checksum(orders_v1.schema) != schema_checksum(orders_v2.schema)
    decision = ddl_change_requires_new_snapshot(
        orders_v1.schema,
        orders_v2.schema,
        probe_has_nonnull_data=make_column_probe(orders_v2),
        column_age_seconds=lambda c: 0.0,
    )
    assert decision.requires_snapshot
    assert "o_orderpriority" in decision.reasons[0]

    # T11: stop, reset, re-snapshot under the new instance
    reset_progress(sink)
    feed_v2 = cdc_events(spark, sf_dir)
    run2 = PipelineRun(
        spark, orders_v2, feed_v2, ["o_orderkey"], sink,
        [AccumulatingReporter()], batch_size=800,
    )
    total = run2.run()
    out = sink.read_committed(spark)
    assert out.count() == total
    assert "o_orderpriority" in out.columns
    # snapshot rows carry the new column's data
    snaps = out.filter((F.col("__operation") == 0))
    assert snaps.filter(F.col("o_orderpriority").isNotNull()).count() == snaps.count()


def test_capture_instance_switch_continue_in_place(spark, sf_dir, tmp_path):
    # v2 adds a fresh all-null nullable column -> NO re-snapshot; the stream
    # continues from stored progress with the evolved schema (T9: no
    # republished rows)
    orders_v1 = load_table(spark, sf_dir, "orders")
    feed_v1 = cdc_events(spark, sf_dir)
    sink = TransactionalDirSink(str(tmp_path / "out"), "orders")
    rep1 = AccumulatingReporter()
    PipelineRun(
        spark, orders_v1, feed_v1, ["o_orderkey"], sink, [rep1], batch_size=800
    ).run()

    orders_v2 = orders_v1.withColumn("note", F.lit(None).cast("string"))
    decision = ddl_change_requires_new_snapshot(
        orders_v1.schema,
        orders_v2.schema,
        probe_has_nonnull_data=make_column_probe(orders_v2),
        column_age_seconds=lambda c: 10.0,
    )
    assert not decision.requires_snapshot

    # continue: same sink, evolved feed — resume means zero change rows redo
    feed_v2 = feed_v1.withColumn("note", F.lit(None).cast("string"))
    rep2 = AccumulatingReporter()
    PipelineRun(
        spark, orders_v2, feed_v2, ["o_orderkey"], sink, [rep2], batch_size=800
    ).run()
    assert sum(m.rows for m in rep2.emitted if m.snapshots == 0) == 0
