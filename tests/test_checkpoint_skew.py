"""Structured Streaming checkpoint resume (T2 the idiomatic way) and
salted skew join."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.operators.skew import salted_join
from sqlserver_cdc_to_kafka_spark.tables import load_table


def test_checkpoint_resume_no_duplicates(spark, sf_dir, tmp_path):
    """Kill/restart mid-stream must not lose or re-emit rows: Spark's
    checkpoint (WAL + commits) is the engine's progress topic (T2)."""
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    ev = load_table(spark, sf_dir, "events")
    schema = ev.schema

    # first file arrives
    ev.filter(F.col("event_id") < 400).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "stage1")
    )
    _copy_parquet(tmp_path / "stage1", src, "a.parquet")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # stream "crashes" after this trigger (stopped)
    n1 = spark.read.parquet(str(out)).count()
    assert n1 == 400

    # second file arrives while the stream is down; restart from checkpoint
    ev.filter(F.col("event_id") >= 400).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "stage2")
    )
    _copy_parquet(tmp_path / "stage2", src, "b.parquet")
    run_once()

    got = spark.read.parquet(str(out))
    assert got.count() == ev.count()  # nothing lost
    assert got.select("event_id").distinct().count() == ev.count()  # no dupes


def _copy_parquet(stage_dir, dst_dir, name):
    part = next(p for p in stage_dir.glob("part-*.parquet"))
    shutil.copyfile(part, dst_dir / name)


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), orders, ["o_orderkey"]
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_left_outer(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    # keys 1..50 only on the left -> must survive with nulls
    dim = (
        orders.select("o_orderkey").filter(F.col("o_orderkey") > 50)
        .withColumn("tag", F.lit("x"))
    )
    out = salted_join(orders, dim, ["o_orderkey"], how="left")
    assert out.count() == orders.count()
    assert out.filter(F.col("tag").isNull()).count() == orders.filter(
        F.col("o_orderkey") <= 50
    ).count()
