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
