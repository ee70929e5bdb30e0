"""Golden tests for the scalar function layer (SURVEY §7 Phase 3 — 'the
riskiest semantic bits'): byte-budget truncation boundaries, SQL Server GUID
ordering, update-mask expansion, LSN hex round-trip."""

from __future__ import annotations

import uuid as uuid_mod

from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.functions.lsn import lsn_hex, lsn_hex_decode
from sqlserver_cdc_to_kafka_spark.functions.masks import update_mask_to_fields
from sqlserver_cdc_to_kafka_spark.functions.row_hash import synthetic_row_hash
from sqlserver_cdc_to_kafka_spark.functions.truncation import utf8_truncate
from sqlserver_cdc_to_kafka_spark.functions.uuids import sql_server_uuid_sort_key


def _reference_cut_str_to_bytes(s: str, max_bytes: int):
    """The reference algorithm (tracked_tables.py:362-395) re-expressed for
    golden comparison: cut at the byte budget, drop any incomplete char."""
    if s == "" or max_bytes < 1:
        return 0, ""
    b = s.encode("utf-8")[:max_bytes]
    out = b.decode("utf-8", errors="ignore")
    return len(out.encode("utf-8")), out


def test_utf8_truncation_multibyte_boundaries(spark):
    cases = [
        "plain ascii text",
        "café",  # 2-byte char at the edge
        "日本語テキスト",  # 3-byte chars
        "emoji \U0001f600\U0001f680 tail",  # 4-byte chars
        "",
        "é" * 10,
    ]
    for budget in (0, 1, 2, 3, 5, 7, 12, 100):
        df = spark.createDataFrame([(c,) for c in cases], "s string")
        out = df.select(
            "s",
            utf8_truncate(F.col("s"), budget).alias("t"),
        ).collect()
        for row in out:
            want_len, want = _reference_cut_str_to_bytes(row["s"], budget)
            assert row["t"] == want, f"budget={budget} s={row['s']!r}"
            assert len(row["t"].encode("utf-8")) == want_len


def _reference_sql_uuid_bytes(u: str) -> bytes:
    """Byte permutation from validation.py:19-41."""
    b = bytearray(uuid_mod.UUID(u).bytes)
    order = [10, 11, 12, 13, 14, 15, 8, 9, 7, 6, 5, 4, 3, 2, 1, 0]
    return bytes(b[i] for i in order)


def test_sql_server_uuid_sort_matches_reference_permutation(spark):
    import random

    rng = random.Random(7)
    uuids = [str(uuid_mod.UUID(int=rng.getrandbits(128))) for _ in range(100)]
    df = spark.createDataFrame([(u,) for u in uuids], "u string")
    got = [
        r["u"]
        for r in df.orderBy(sql_server_uuid_sort_key(F.col("u")), "u").collect()
    ]
    want = sorted(uuids, key=lambda u: (_reference_sql_uuid_bytes(u), u))
    assert got == want


def test_update_mask_expansion(spark):
    names = ["a", "b", "c", "d"]
    df = spark.createDataFrame([(0,), (1,), (5,), (15,)], "mask int")
    out = {
        r["mask"]: r["fields"]
        for r in df.select(
            "mask", update_mask_to_fields("mask", names).alias("fields")
        ).collect()
    }
    assert out == {0: [], 1: ["a"], 5: ["a", "c"], 15: ["a", "b", "c", "d"]}


def test_lsn_hex_roundtrip_values(spark):
    df = spark.createDataFrame([(0,), (255,), (2**40 + 7,)], "seq long")
    rows = df.select(
        "seq",
        lsn_hex(F.col("seq")).alias("hx"),
        lsn_hex_decode(lsn_hex(F.col("seq"))).alias("back"),
    ).collect()
    for r in rows:
        assert r["hx"].startswith("0x") and len(r["hx"]) == 22
        assert r["back"] == r["seq"]


def test_row_hash_null_vs_empty_distinct(spark):
    df = spark.createDataFrame([("x", None), ("x", ""), (None, "x")], "a string, b string")
    hashes = [r["h"] for r in df.select(synthetic_row_hash(["a", "b"]).alias("h")).collect()]
    assert len(set(hashes)) == 3  # null, empty, and swapped values all differ


def test_epoch_micros_ntz_is_tz_invariant_in_dst_gap(spark):
    """Round-6 tz probe regression: TIMESTAMPDIFF on NTZ round-trips the
    wall-clock through session-local time, so 1999-04-04 02:00 (inside the
    America/New_York spring-forward gap) shifted +1h under that session tz.
    epoch_micros must be a pure field read — same value under every tz."""
    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import epoch_micros

    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '1999-04-04 02:00:00' AS gap, "
        "TIMESTAMP_NTZ '1999-10-31 01:30:00' AS overlap, "
        "TIMESTAMP_NTZ '2001-06-15 12:34:56.789012' AS frac"
    )
    want = {
        "gap": 923_191_200_000_000,
        "overlap": 941_333_400_000_000,
        "frac": 992_608_496_789_012,
    }
    orig = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Kathmandu"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            row = df.select(
                *[epoch_micros(df, c).alias(c) for c in want]
            ).collect()[0]
            assert row.asDict() == want, f"tz={tz}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)


def test_int_div_truncation_matches_duckdb_all_signs(spark):
    """Round-8 ADVICE closure: the advice presumed DuckDB ``//`` floors and
    flagged negative numerators as a silent one-bucket divergence.  Measured:
    DuckDB 1.0.0 integer ``//`` truncates toward zero, exactly like Spark's
    ``div`` — int_div therefore matches the oracle for EVERY sign
    combination, including quotients above 2^53 where the old double-cast
    idiom rounded across bucket boundaries.  If a DuckDB upgrade ever flips
    ``//`` to floor semantics, this test fails loudly instead of letting a
    signed call site drift."""
    import duckdb

    from sqlserver_cdc_to_kafka_spark.functions.datetime_fns import int_div

    cases = [
        (7, 3), (-7, 3), (7, -3), (-7, -3),          # inexact, all signs
        (6, 3), (-6, 3), (6, -3), (-6, -3),          # exact, all signs
        (0, 5), (0, -5), (1, 2), (-1, 2),
        (2**60 + 1, 7), (-(2**60 + 1), 7),           # above double precision
        (2**62, 86_400_000_000), (-(2**62), 86_400_000_000),
    ]
    df = spark.createDataFrame(cases, "n long, d long")
    got = {
        (r["n"], r["d"]): r["q"]
        for r in df.select("n", "d", int_div(F.col("n"), F.col("d")).alias("q")).collect()
    }
    con = duckdb.connect()
    for n, d in cases:
        want = con.execute(f"SELECT CAST({n} AS BIGINT) // CAST({d} AS BIGINT)").fetchone()[0]
        assert got[(n, d)] == want, f"{n} // {d}: spark={got[(n, d)]} duckdb={want}"
