"""CLI entry point (`python -m sqlserver_cdc_to_kafka_spark`) — the
reference's executable surface (`cdc_kafka/__main__.py`, options.py flag
names) driven in-process: pipeline mode writes one parquet dir per topic;
the read-only modes emit JSON check lines and write nothing."""

from __future__ import annotations

import json

import pytest

from sqlserver_cdc_to_kafka_spark.__main__ import main


def _emitted(capsys):
    return [json.loads(line) for line in capsys.readouterr().out.splitlines()]


def test_pipeline_mode_writes_topic(spark, sf_dir, tmp_path, capsys):
    rc = main(["--sf-dir", sf_dir, "--sink-dir", str(tmp_path),
               "--db-row-batch-size", "500",
               "--topic-name-template", "{schema_name}.{table_name}.cdc"])
    assert rc == 0
    out = _emitted(capsys)
    (row,) = [r for r in out if r["kind"] == "topic_written"]
    assert row["topic"] == "dbo.orders.cdc"
    assert row["snapshot_pages"] >= 2  # 500-row pages actually paginated
    # every order exactly once (snapshot) plus every change event
    orders_n = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    written = spark.read.parquet(row["path"])
    assert written.filter("__operation = 0").count() == orders_n
    assert row["rows"] > orders_n


def test_tombstone_disable_flag(spark, sf_dir, tmp_path, capsys):
    rc = main(["--sf-dir", sf_dir, "--sink-dir", str(tmp_path),
               "--disable-deletion-tombstones"])
    assert rc == 0
    (row,) = [r for r in _emitted(capsys) if r["kind"] == "topic_written"]
    assert spark.read.parquet(row["path"]).filter("__operation = 1").count() == 0


def test_exclude_regex_skips_table(sf_dir, tmp_path, capsys):
    rc = main(["--sf-dir", sf_dir, "--sink-dir", str(tmp_path),
               "--table-exclude-regex", "orders"])
    assert rc == 0
    out = _emitted(capsys)
    assert [r["kind"] for r in out] == ["skipped"]


def test_run_validations_is_read_only(sf_dir, tmp_path, capsys):
    rc = main(["--sf-dir", sf_dir, "--run-validations"])
    assert rc == 0
    out = _emitted(capsys)
    names = {r["name"] for r in out if r["kind"] == "check"}
    assert {"val_topic_summary", "val_progress_rollup",
            "val_snapshot_history"} <= names
    assert not list(tmp_path.iterdir())  # nothing written


def test_tool_modes(sf_dir, capsys):
    assert main(["--sf-dir", sf_dir, "--show-snapshot-history"]) == 0
    assert main(["--sf-dir", sf_dir, "--find-truncation-candidates"]) == 0
    out = _emitted(capsys)
    assert {r["name"] for r in out} == {"val_snapshot_history",
                                       "val_truncation_report"}


def test_pipeline_mode_requires_sink_dir(sf_dir):
    assert main(["--sf-dir", sf_dir]) == 2


def test_options_json_roundtrip(sf_dir, tmp_path, capsys):
    cfg = json.dumps({"topic_name_template": "{table_name}_only",
                      "db_row_batch_size": 1000})
    rc = main(["--sf-dir", sf_dir, "--sink-dir", str(tmp_path),
               "--options-json", cfg])
    assert rc == 0
    (row,) = [r for r in _emitted(capsys) if r["kind"] == "topic_written"]
    assert row["topic"] == "orders_only"


def test_invalid_option_value_rejected(sf_dir):
    with pytest.raises(ValueError):
        main(["--sf-dir", sf_dir, "--run-validations",
              "--lsn-gap-handling", "bogus"])


def test_reset_progress_tool(spark, sf_dir, tmp_path, capsys):
    """progress_reset_tool analog: the reset topic resumes from scratch,
    the untouched topic keeps its offset, and dry-run changes nothing."""
    import pyspark.sql.functions as F

    from sqlserver_cdc_to_kafka_spark.fixtures.cdc_events import cdc_events
    from sqlserver_cdc_to_kafka_spark.streaming.change_feed import MicroBatcher
    from sqlserver_cdc_to_kafka_spark.streaming.sinks import TransactionalDirSink

    feed = cdc_events(spark, sf_dir).filter(F.col("change_seq") < 2000)
    sinks = {}
    for topic in ("orders_cdc", "customer_cdc"):
        sink = TransactionalDirSink(str(tmp_path / topic), topic)
        sinks[topic] = sink

        def write(batch, bid, s=sink):
            s.commit_batch(batch, bid, batch.agg(F.max("change_seq")).collect()[0][0])

        MicroBatcher(feed, topic, batch_size=700, sink=write).run_to_completion()
    max_seq = feed.agg(F.max("change_seq")).collect()[0][0]
    assert sinks["orders_cdc"].last_progress() == max_seq

    # dry-run: reports but does not write
    rc = main(["--reset-progress", "--topic-names", "orders_cdc",
               "--sink-dir", str(tmp_path)])
    assert rc == 0
    (row,) = [r for r in _emitted(capsys) if r["kind"] == "reset"]
    assert row["prior_position"] == max_seq and row["executed"] is False
    assert sinks["orders_cdc"].last_progress() == max_seq

    # execute: reset topic resumes from scratch, other topic untouched
    rc = main(["--reset-progress", "--topic-names", "orders_cdc,missing_topic",
               "--sink-dir", str(tmp_path), "--execute"])
    assert rc == 0
    rows = [r for r in _emitted(capsys) if r["kind"] == "reset"]
    assert {r["topic"]: r.get("found") for r in rows} == {
        "orders_cdc": True, "missing_topic": False,
    }
    assert sinks["orders_cdc"].last_progress() is None
    assert sinks["customer_cdc"].last_progress() == max_seq
    # committed data is untouched (only progress is rewritten)
    assert sinks["orders_cdc"].read_committed(spark).count() == feed.count()
    # a fresh batcher over the reset topic starts from scratch
    mb = MicroBatcher(feed, "orders_cdc", batch_size=700)
    mb._offset = sinks["orders_cdc"].last_progress()
    assert mb.run_once() == 700


def test_run_query_and_list(spark, sf_dir, capsys):
    rc = main(["--list-queries"])
    assert rc == 0
    names = capsys.readouterr().out.split()
    assert "cdc_count_by_operation" in names and len(names) > 200

    rc = main(["--run-query", "cdc_count_by_operation", "--sf-dir", sf_dir,
               "--limit", "2"])
    assert rc == 0
    (row,) = [r for r in _emitted(capsys) if r["kind"] == "query"]
    assert row["name"] == "cdc_count_by_operation"
    assert 1 <= row["n_shown"] <= 2
    assert all("__operation" in r for r in row["rows"])

    rc = main(["--run-query", "no_such_query", "--sf-dir", sf_dir])
    assert rc == 2

    # a bad SECOND name must fail the whole request up front — no partial
    # results may be emitted before the exit code 2
    rc = main(
        ["--run-query", "cdc_count_by_operation,no_such_query",
         "--sf-dir", sf_dir]
    )
    assert rc == 2
    assert not [r for r in _emitted(capsys) if r["kind"] == "query"]
