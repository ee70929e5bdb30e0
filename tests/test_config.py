"""Engine config surface tests (the reference's options.py parity)."""

from __future__ import annotations

import pytest

from sqlserver_cdc_to_kafka_spark.config import EngineConfig


def test_defaults_mirror_reference():
    c = EngineConfig()
    assert c.db_row_batch_size == 2000  # options.py:282-285 default
    assert c.lsn_gap_handling == "raise_exception"
    assert not c.disable_deletion_tombstones
    assert c.message_serializer == "json"


def test_validation_rejects_bad_enums():
    with pytest.raises(ValueError):
        EngineConfig(lsn_gap_handling="explode")
    with pytest.raises(ValueError):
        EngineConfig(new_follow_start_point="middle")
    with pytest.raises(ValueError):
        EngineConfig(db_row_batch_size=0)


def test_table_filters():
    c = EngineConfig(
        table_include_regex=r"^dbo\.",
        table_exclude_regex=r"_audit$",
        snapshot_table_exclude_regex=r"^dbo\.big",
    )
    assert c.table_followed("dbo.orders")
    assert not c.table_followed("sales.orders")
    assert not c.table_followed("dbo.orders_audit")
    assert c.table_snapshotted("dbo.orders")
    assert not c.table_snapshotted("dbo.big_table")  # followed but not snapshotted
    assert c.table_followed("dbo.big_table")


def test_topic_template_and_json_roundtrip():
    c = EngineConfig(topic_name_template="cdc.{schema_name}.{table_name}")
    assert c.topic_for("dbo", "orders") == "cdc.dbo.orders"
    c2 = EngineConfig.from_json(
        '{"db_row_batch_size": 500, "truncate_fields": {"dbo.t.c": 64}}'
    )
    assert c2.db_row_batch_size == 500
    assert c2.truncate_fields == {"dbo.t.c": 64}


def test_config_drives_components():
    from sqlserver_cdc_to_kafka_spark.serializers import get_serializer
    from sqlserver_cdc_to_kafka_spark.streaming.metrics import load_reporters

    c = EngineConfig(metrics_reporters="stdout, memory")
    assert len(load_reporters(c.metrics_reporters)) == 2
    assert get_serializer(c.message_serializer).__class__.__name__ == "JsonSerializer"
