"""Unit tests for the ChangeIndex model (SURVEY §1.1 #3): the struct column
must order exactly like the reference's ChangeIndex.__lt__
(cdc_kafka/change_index.py:38-47)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.model.change_index import (
    HIGHEST_CHANGE_INDEX,
    LOWEST_CHANGE_INDEX,
    change_index_from_seq,
    change_index_hex,
    change_index_literal,
    is_probably_heartbeat,
)


def _py_key(t):
    # the reference compares (lsn, command_id, seqval, operation) lexicographically
    return (t[0], t[1], t[2], t[3])


def test_struct_ordering_matches_lexicographic(spark):
    rng = random.Random(42)
    rows = []
    for i in range(200):
        lsn = bytes(rng.randrange(256) for _ in range(10))
        seqval = bytes(rng.randrange(256) for _ in range(10))
        rows.append((i, lsn, rng.randrange(0, 5), seqval, rng.randrange(0, 5)))
    df = spark.createDataFrame(rows, "id long, lsn binary, command_id int, seqval binary, operation int")
    idx = F.struct("lsn", "command_id", "seqval", "operation")
    got = [r["id"] for r in df.orderBy(idx).collect()]
    want = [t[0] for t in sorted(rows, key=lambda t: _py_key(t[1:]))]
    assert got == want


def test_sentinel_bounds(spark):
    df = spark.range(1).select(
        (change_index_literal(LOWEST_CHANGE_INDEX) < change_index_literal(HIGHEST_CHANGE_INDEX)).alias("lt"),
        is_probably_heartbeat(change_index_literal(HIGHEST_CHANGE_INDEX)).alias("hb"),
    )
    row = df.collect()[0]
    assert row["lt"] is True
    assert row["hb"] is True


def test_seq_expansion_and_hex(spark):
    df = spark.createDataFrame([(1,), (255,), (65536,)], "seq long").select(
        "seq",
        change_index_from_seq(F.col("seq")).alias("idx"),
        change_index_hex(F.col("seq")).alias("hx"),
    )
    rows = {r["seq"]: r for r in df.collect()}
    assert rows[255]["hx"] == "0x" + "0" * 18 + "ff"
    assert len(rows[1]["idx"]["lsn"]) == 10
    assert rows[65536]["idx"]["lsn"] == b"\x00" * 7 + b"\x01\x00\x00"
    # ordering by expanded struct == ordering by seq
    ordered = [r["seq"] for r in df.orderBy(F.col("idx")).collect()]
    assert ordered == [1, 255, 65536]
