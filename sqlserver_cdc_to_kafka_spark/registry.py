"""Registry of declared queries: the driver contract (__spark_entry__).

Every implemented operator from SURVEY.md §2 (plus the beyond-reference
pipeline ops) registers here as a named query ``(spark, sf_dir) -> DataFrame``
with, where SQL-expressible, a DuckDB oracle SQL string over the same parquet
views. Column names/aliases MUST match between the two — the driver sorts
columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, bench: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, bench)
        return fn

    return deco


# The driver's correctness gate checks the FIRST 50 registered queries per
# round. Names listed here are returned first (in this order) so the round's
# at-risk set — queries with no driver witness since r1, including the three
# r1 FAILs and the trio broken by the events-ts testdata migration — all get
# a driver row this round. Everything else (driver-green in r4) follows in
# registration order. Rotate this list each round.
_DRIVER_PRIORITY: list[str] = [
    # broken-in-r4 trio (events-ts regression, fixed this round)
    "window_sliding_hourly",
    "window_session_per_user",
    "stream_windowed_counts_drain",
    # new in round 5 — never driver-checked
    "pipeline_decontaminate_train",
    "pipeline_ngram_lm_score",
    "pipeline_kmeans_centroids",
    "pipeline_filter_funnel",
    "dedup_incremental_batch",
    # r1 FAILs never re-confirmed by the driver
    "cdc_incremental_agg",
    "val_progress_rollup",
    "window_hierarchical_rollup",
    # remaining never-driver-checked-since-r1 set (registration order)
    "fn_datetime_parts",
    "val_truncation_report",
    "olap_pricing_summary",
    "olap_shipping_priority",
    "olap_local_supplier_volume",
    "cdc_unified_topics",
    "olap_value_histogram",
    "join_asof_order_state",
    "olap_value_percentiles",
    "join_range_version_intervals",
    "cdc_count_by_operation",
    "cdc_change_window_scan",
    "cdc_ordered_merge",
    "cdc_order_regression_check",
    "cdc_compaction_last_per_key",
    "cdc_replay_merge",
    "cdc_tombstones",
    "snapshot_keyset_page",
    "snapshot_keyset_page_composite",
    "snapshot_envelope",
    "serde_json_roundtrip",
    "serde_avro_roundtrip",
    "cdc_struct_index_order",
    "cdc_scd2_history",
    "stream_drain_change_feed",
    "stream_snapshot_unified_drain",
    "fn_lsn_hex_roundtrip",
    "fn_row_hash_key",
    "fn_string_truncation",
    "fn_update_mask",
    "fn_uuid_sort_order",
    "fn_clock_skew_adjust",
    "join_region_revenue",
    "join_lsn_time_mapping",
    "join_delete_semi_anti",
    "window_tumbling_hourly",
    "topk_orders_per_priority",
    "join_asof_version",
    "join_salted_skew",
]


def load_all() -> dict[str, Query]:
    """Import all query modules (side-effect registration) and return the
    registry, ordered so the driver's capped correctness window covers the
    round's at-risk set first (see _DRIVER_PRIORITY)."""
    from sqlserver_cdc_to_kafka_spark import queries as _q  # noqa: F401

    ordered: dict[str, Query] = {}
    for name in _DRIVER_PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


def spark_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items() if q.bench}
