"""Catalog discovery: statement structure + the pure-Python halves
(capture-instance version selection, clock-skew adjustment)."""

from __future__ import annotations

import datetime

import pytest

from sqlserver_cdc_to_kafka_spark.sources.catalog_sql import (
    CaptureInstance,
    ClockSync,
    capture_instances_metadata_sql,
    change_rows_per_second_sql,
    change_table_index_cols_sql,
    db_time_sql,
    ddl_history_sql,
    indexed_cols_sql,
    latest_cdc_entry_time_sql,
    select_latest_capture_instances,
    tracked_tables_metadata_sql,
)


def test_capture_instances_metadata_sql_shape():
    sql = capture_instances_metadata_sql()
    assert "[cdc].[change_tables]" in sql
    assert "[cdc].[captured_columns]" in sql
    # the column-shape fingerprint: checksum over name/id/type/ordinal/computed
    assert "CHECKSUM_AGG" in sql and "col_types_checksum" in sql
    assert "COALESCE" in sql  # instance with no columns -> -1, not NULL
    assert sql.rstrip().endswith("ORDER BY source_object_id")


def test_tracked_tables_metadata_sql_shape_and_quoting():
    sql = tracked_tables_metadata_sql(["dbo_orders_v1", "dbo_it's"])
    assert "IN ('dbo_orders_v1', 'dbo_it''s')" in sql  # quotes doubled
    assert "LEFT JOIN [cdc].[index_columns]" in sql  # PK ordinals may be absent
    assert "LEFT JOIN sys.columns" in sql  # precision/scale/nullability
    assert "primary_key_ordinal" in sql and "decimal_scale" in sql
    assert sql.rstrip().endswith("ORDER BY ct.object_id, cc.column_ordinal")


def test_probe_statements_shape():
    assert "ORDER BY tran_end_time DESC" in latest_cdc_entry_time_sql()
    rps = change_rows_per_second_sql("[cdc].[dbo_orders_CT]")
    assert "NULLIF(DATEDIFF" in rps  # zero-span guard: no divide-by-zero
    assert "[cdc].[lsn_time_mapping]" in rps
    assert indexed_cols_sql().count("?") == 1
    assert "key_ordinal] = 1" in indexed_cols_sql()
    assert "is_disabled] = 0" in indexed_cols_sql()
    assert change_table_index_cols_sql().count("?") == 1
    assert "CLUSTERED" in change_table_index_cols_sql()
    ddl = ddl_history_sql()
    assert ddl.count("?") == 1 and "required_column_update = 0" in ddl
    assert db_time_sql() == "SELECT GETDATE()"


def _ci(fq, name, day, lsn=b"\x01"):
    return CaptureInstance(
        fq_name=fq,
        capture_instance_name=name,
        start_lsn=lsn,
        create_date=datetime.datetime(2024, 1, day),
    )


def test_select_latest_by_create_date_and_skip_new():
    chosen = select_latest_capture_instances(
        [
            _ci("dbo.orders", "dbo_orders_v1", 1),
            _ci("dbo.orders", "dbo_orders_v2", 5),
            # brand-new instance: catalog row exists but LSN not yet assigned
            CaptureInstance("dbo.orders", "dbo_orders_v3", None, None),
            _ci("dbo.items", "dbo_items", 2),
        ]
    )
    assert chosen["dbo.orders"].capture_instance_name == "dbo_orders_v2"
    assert chosen["dbo.items"].capture_instance_name == "dbo_items"


def test_select_latest_by_regex_version():
    chosen = select_latest_capture_instances(
        [
            # create dates deliberately INVERTED vs the version numbers
            _ci("dbo.orders", "dbo_orders_v003", 1),
            _ci("dbo.orders", "dbo_orders_v010", 9),
        ],
        strategy="regex",
        version_regex=r".*_v(\d+)",
    )
    # string sort of the captured group: '010' < '003' lexicographically
    # is false ('0' == '0', '1' > '0') -> v010 wins, as the reference's
    # sorted(key=regex_matched_group) does
    assert chosen["dbo.orders"].capture_instance_name == "dbo_orders_v010"


def test_select_latest_include_exclude_regexes():
    instances = [
        _ci("dbo.orders", "dbo_orders", 1),
        _ci("dbo.audit_log", "dbo_audit_log", 1),
        _ci("staging.orders", "staging_orders", 1),
    ]
    chosen = select_latest_capture_instances(
        instances, include_regex=r"dbo\..*", exclude_regex=r".*\.audit.*"
    )
    assert set(chosen) == {"dbo.orders"}


def test_select_latest_regex_strategy_requires_regex():
    with pytest.raises(ValueError):
        select_latest_capture_instances([], strategy="regex")
    with pytest.raises(ValueError):
        select_latest_capture_instances([], strategy="bogus")


def test_clock_sync_measures_and_refreshes_skew():
    local = {"t": datetime.datetime(2024, 1, 1, 12, 0, 0)}
    skew = {"d": datetime.timedelta(seconds=30)}  # DB runs 30s behind

    sync = ClockSync(
        db_now_fn=lambda: local["t"] - skew["d"],
        local_now_fn=lambda: local["t"],
        sync_interval=datetime.timedelta(minutes=5),
    )
    db_time = datetime.datetime(2024, 1, 1, 11, 59, 0)
    assert sync.db_time_to_utc(db_time) == db_time + datetime.timedelta(seconds=30)

    # skew drifts, but within the interval the cached measurement holds
    skew["d"] = datetime.timedelta(seconds=90)
    local["t"] += datetime.timedelta(minutes=1)
    assert sync.db_time_to_utc(db_time) == db_time + datetime.timedelta(seconds=30)

    # past the interval the next conversion re-measures
    local["t"] += datetime.timedelta(minutes=10)
    assert sync.db_time_to_utc(db_time) == db_time + datetime.timedelta(seconds=90)
