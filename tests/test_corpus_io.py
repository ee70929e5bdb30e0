"""JSONL ingest/egress + sharded writer (pipeline/corpus_io.py)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.pipeline.corpus_io import (
    DOCUMENTS_SCHEMA,
    read_jsonl,
    shard_column,
    split_corrupt,
    write_jsonl,
    write_sharded,
)
from sqlserver_cdc_to_kafka_spark.tables import load_table


def _fingerprint(df, cols):
    return {tuple(r) for r in df.select(*cols).collect()}


def test_jsonl_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    clean, corrupt = split_corrupt(read_jsonl(spark, path, DOCUMENTS_SCHEMA))
    assert corrupt.count() == 0
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    assert _fingerprint(clean, cols) == _fingerprint(docs, cols)


def test_jsonl_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    path = tmp_path / "mixed"
    path.mkdir()
    good = [
        {"doc_id": 1, "text": "a b", "lang": "en", "source": "s", "n_chars": 3},
        {"doc_id": 2, "text": "c d", "lang": "en", "source": "s", "n_chars": 3},
    ]
    with open(path / "part-0.jsonl", "w") as f:
        f.write(json.dumps(good[0]) + "\n")
        f.write("{this is not json\n")
        f.write(json.dumps(good[1]) + "\n")
    df = read_jsonl(spark, str(path), DOCUMENTS_SCHEMA)
    assert df.count() == 3
    clean, corrupt = split_corrupt(df)
    assert corrupt.count() == 1
    assert clean.count() == 2
    assert {r["doc_id"] for r in clean.collect()} == {1, 2}


def test_sharded_write_is_deterministic_balanced_and_prunable(
    spark, sf_dir, tmp_path
):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    out = str(tmp_path / "sharded")
    write_sharded(docs, out, n_shards=8)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert len(dirs) == 8
    # one data file per shard (the repartition-on-shard co-location)
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert len(files) == 1, d
    back = spark.read.parquet(out)
    assert back.count() == n
    # shard assignment is the content-stable hash (same id → same shard)
    expect = docs.select("doc_id", shard_column(n_shards=8).alias("shard"))
    got = back.select("doc_id", F.col("shard").cast("bigint").alias("shard"))
    assert _fingerprint(got, ["doc_id", "shard"]) == _fingerprint(
        expect, ["doc_id", "shard"]
    )
    # directory pruning: a shard filter reads exactly that shard's rows
    one = back.filter(F.col("shard") == 3)
    assert one.count() == expect.filter(F.col("shard") == 3).count()
    # rewriting the same corpus yields the same membership (incremental
    # rebuild safety)
    out2 = str(tmp_path / "sharded2")
    write_sharded(docs, out2, n_shards=8)
    assert _fingerprint(
        spark.read.parquet(out2).select("doc_id", F.col("shard").cast("bigint")),
        ["doc_id", "shard"],
    ) == _fingerprint(got, ["doc_id", "shard"])


def test_csv_corrupt_lines_quarantined_and_quotes_roundtrip(spark, tmp_path):
    from sqlserver_cdc_to_kafka_spark.pipeline.corpus_io import (
        read_csv_strict,
        write_csv,
    )

    path = tmp_path / "mixedcsv"
    path.mkdir()
    with open(path / "part-0.csv", "w") as f:
        f.write("doc_id,text,lang,source,n_chars\n")
        f.write('1,"has, comma and ""quote""",en,s,20\n')
        f.write("not-an-int,bad row here\n")
        f.write("2,plain,en,s,5\n")
    df = read_csv_strict(spark, str(path), DOCUMENTS_SCHEMA)
    clean, corrupt = split_corrupt(df)
    assert corrupt.count() == 1
    rows = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert rows == {1: 'has, comma and "quote"', 2: "plain"}


def test_csv_writer_reader_roundtrip_free_text(spark, tmp_path):
    from sqlserver_cdc_to_kafka_spark.pipeline.corpus_io import (
        read_csv_strict,
        write_csv,
    )

    data = [
        (1, 'text with "quotes", commas, and\ttabs', "en", "s", 36),
        (2, "unicode: café — emdash", "fr", "s", 20),
    ]
    df = spark.createDataFrame(
        data, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "csvout")
    write_csv(df, out)
    clean, corrupt = split_corrupt(read_csv_strict(spark, out, DOCUMENTS_SCHEMA))
    assert corrupt.count() == 0
    got = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert got == {1: data[0][1], 2: data[1][1]}
