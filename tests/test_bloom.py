"""Bloom filter structural properties beyond the oracle gate: the oracle
pins one build/probe pair bit-for-bit; these pin the INVARIANTS that make
the structure usable distributed — no false negatives ever, and bitmap
merge (bit_or) equals rebuild over the union (the property that lets
partition partials / daily shards union without rebuilding)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.pipeline.sketch import (
    bloom_build_words,
    bloom_membership,
)


def _keys(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "k bigint")


def test_bloom_no_false_negatives(spark):
    build = _keys(spark, range(0, 4000, 3))
    flagged = {
        r["k"] for r in bloom_membership(build, build, "k").collect()
    }
    assert flagged == set(range(0, 4000, 3))  # every member flagged


def test_bloom_false_positive_rate_bounded(spark):
    build = _keys(spark, range(0, 4000, 3))
    probes = _keys(spark, range(1, 4000, 3))  # disjoint from build
    fp = bloom_membership(probes, build, "k").count()
    # m=65536, n=1334, k=3 → fill ~6%, expected fp ≈ (0.059)^3 ≈ 2e-4;
    # generous ceiling still catches a broken hash (which would flag ~all)
    assert fp <= 20


def test_bloom_merge_equals_rebuild(spark):
    a = _keys(spark, range(0, 1000))
    b = _keys(spark, range(500, 1500))
    both = _keys(spark, range(0, 1500))
    merged = (
        bloom_build_words(a, "k")
        .unionByName(bloom_build_words(b, "k"))
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    want = {
        (r["word_idx"], r["bits"]) for r in bloom_build_words(both, "k").collect()
    }
    got = {(r["word_idx"], r["bits"]) for r in merged.collect()}
    assert got == want
