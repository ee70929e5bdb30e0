"""Catalog-discovery T-SQL + startup selection logic (SURVEY §2.1 S3/S4/S5).

A live deployment discovers its work from SQL Server's CDC catalog:
``cdc.change_tables`` ⋈ ``cdc.captured_columns`` (capture instances + a
column-shape checksum), the 4-way column/index metadata join, and the
side-channel probes (latest log entry time, change rates, indexed columns,
DDL history). The environment here has no SQL Server, so — exactly like
``jdbc_sql.py`` does for keyset paging — this module generates the
statements and unit-tests their structure, and implements the pure-Python
halves (capture-instance version selection, clock-skew adjustment) that
need no database at all.

Reference behavior: ``cdc_kafka/sql_queries.py:11-117`` (statements),
``cdc_kafka/build_startup_state.py:396-449`` (instance selection),
``cdc_kafka/clock_sync.py:24-43`` (skew measurement loop).
"""

from __future__ import annotations

import datetime
import re
from collections import defaultdict
from collections.abc import Callable, Iterable
from dataclasses import dataclass

CDC_SCHEMA = "cdc"

CREATE_DATE_STRATEGY = "create_date"
REGEX_STRATEGY = "regex"

DB_CLOCK_SYNC_INTERVAL = datetime.timedelta(minutes=5)


# ---------------------------------------------------------------------------
# Statement generation (sql_queries.py:11-117)
# ---------------------------------------------------------------------------


def capture_instances_metadata_sql() -> str:
    """S3: every capture instance with its table, start LSN, create date and
    a CHECKSUM_AGG over the captured-column shapes — the single round trip
    that both lists instances and fingerprints their schemas
    (sql_queries.py:11-27; the checksum is what the schema-evolution
    restart check diffs against plans/evolution.schema_checksum)."""
    return f"""
SELECT
    OBJECT_SCHEMA_NAME(source_object_id) AS schema_name
    , OBJECT_NAME(source_object_id) AS table_name
    , capture_instance
    , start_lsn
    , create_date
    , COALESCE(CHECKSUM_AGG(CHECKSUM(
        cc.column_name, cc.column_id, cc.column_type, cc.column_ordinal, cc.is_computed
    )), -1) AS col_types_checksum
FROM [{CDC_SCHEMA}].[change_tables] AS ct
JOIN [{CDC_SCHEMA}].[captured_columns] AS cc ON ct.object_id = cc.object_id
GROUP BY source_object_id, capture_instance, start_lsn, create_date
ORDER BY source_object_id
""".strip()


def tracked_tables_metadata_sql(capture_instance_names: Iterable[str]) -> str:
    """S4: full column/key metadata for the chosen instances — change_tables
    ⋈ captured_columns, LEFT JOIN index_columns (PK ordinals) and
    sys.columns (precision/scale/nullability) (sql_queries.py:30-56).
    Single quotes in instance names are doubled; injection-safe for the
    identifier-ish values this receives."""
    ci_list = ", ".join("'" + n.replace("'", "''") + "'" for n in capture_instance_names)
    return f"""
SELECT
    OBJECT_SCHEMA_NAME(ct.source_object_id) AS schema_name
    , OBJECT_NAME(ct.source_object_id) AS table_name
    , ct.capture_instance AS capture_instance_name
    , ct.start_lsn AS capture_min_lsn
    , cc.column_ordinal AS change_table_ordinal
    , cc.column_name AS column_name
    , cc.column_type AS sql_type_name
    , cc.is_computed AS is_computed
    , ic.index_ordinal AS primary_key_ordinal
    , sc.precision AS decimal_precision
    , sc.scale AS decimal_scale
    , sc.is_nullable AS is_nullable
FROM
    [{CDC_SCHEMA}].[change_tables] AS ct
    INNER JOIN [{CDC_SCHEMA}].[captured_columns] AS cc ON (ct.object_id = cc.object_id)
    LEFT JOIN [{CDC_SCHEMA}].[index_columns] AS ic
        ON (cc.object_id = ic.object_id AND cc.column_id = ic.column_id)
    LEFT JOIN sys.columns AS sc ON (sc.object_id = ct.source_object_id AND sc.column_id = cc.column_id)
WHERE ct.capture_instance IN ({ci_list})
ORDER BY ct.object_id, cc.column_ordinal
""".strip()


def latest_cdc_entry_time_sql() -> str:
    """Newest transaction end time in lsn_time_mapping — the 'is the log
    moving' probe (sql_queries.py:59-65)."""
    return (
        f"SELECT TOP 1 tran_end_time FROM [{CDC_SCHEMA}].[lsn_time_mapping] "
        f"ORDER BY tran_end_time DESC"
    )


def change_rows_per_second_sql(fq_change_table_name: str) -> str:
    """A5's deployment form: average change rate of one capture table over
    its mapped transaction-time span (sql_queries.py:68-75)."""
    return (
        f"SELECT ISNULL(COUNT(*) / NULLIF(DATEDIFF(second, "
        f"MIN(ltm.tran_end_time), MAX(ltm.tran_end_time)), 0), 0) "
        f"FROM {fq_change_table_name} AS ct WITH (NOLOCK) "
        f"INNER JOIN [{CDC_SCHEMA}].[lsn_time_mapping] AS ltm WITH (NOLOCK) "
        f"ON ct.__$start_lsn = ltm.start_lsn"
    )


def indexed_cols_sql() -> str:
    """S5: leading columns of enabled, unfiltered indexes on a table — the
    candidate keyset columns (sql_queries.py:92-108). One '?' bind: the
    fully-qualified table name for OBJECT_ID."""
    return """
SELECT DISTINCT c.[name]
FROM sys.index_columns AS ic
INNER JOIN sys.indexes AS i
    ON ic.[object_id] = i.[object_id] AND ic.[index_id] = i.[index_id]
INNER JOIN sys.columns AS c
    ON ic.[object_id] = c.[object_id] AND ic.[column_id] = c.[column_id]
WHERE ic.[object_id] = OBJECT_ID(?)
    AND ic.[key_ordinal] = 1
    AND i.[is_disabled] = 0
    AND i.[type] != 0
    AND i.has_filter = 0
""".strip()


def change_table_index_cols_sql() -> str:
    """S5: clustered-index key columns of a change table, in key order
    (sql_queries.py:77-85). One '?' bind (OBJECT_ID)."""
    return """
SELECT COL_NAME(ic.object_id, ic.column_id)
FROM sys.indexes AS i
INNER JOIN sys.index_columns AS ic ON i.object_id = ic.object_id AND i.index_id = ic.index_id
WHERE i.object_id = OBJECT_ID(?) AND type_desc = 'CLUSTERED'
ORDER BY key_ordinal
""".strip()


def ddl_history_sql() -> str:
    """T11 input: outstanding DDL against a capture table, with age
    (sql_queries.py:111-117). One '?' bind (OBJECT_ID)."""
    return (
        f"SELECT ddl_command, DATEDIFF(second, ddl_time, GETDATE()) AS age_seconds "
        f"FROM [{CDC_SCHEMA}].[ddl_history] "
        f"WHERE object_id = OBJECT_ID(?) AND required_column_update = 0"
    )


def db_time_sql() -> str:
    """Clock-sync probe (sql_queries.py:88-89)."""
    return "SELECT GETDATE()"


# ---------------------------------------------------------------------------
# Capture-instance version selection (build_startup_state.py:396-449)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CaptureInstance:
    """One row of capture_instances_metadata_sql, minus the checksum."""

    fq_name: str  # schema.table
    capture_instance_name: str
    start_lsn: bytes | None
    create_date: datetime.datetime | None


def select_latest_capture_instances(
    instances: Iterable[CaptureInstance],
    strategy: str = CREATE_DATE_STRATEGY,
    version_regex: str | None = None,
    include_regex: str | None = None,
    exclude_regex: str | None = None,
) -> dict[str, CaptureInstance]:
    """Pick ONE capture instance per source table: tables are filtered by
    the include/exclude regexes (match against 'schema.table',
    case-insensitive — P7), brand-new instances whose start_lsn/create_date
    are still NULL are skipped for this pass, and among the survivors the
    newest wins by create_date or by the regex-captured version group
    (build_startup_state.py:400-449)."""
    if strategy == REGEX_STRATEGY and not version_regex:
        raise ValueError(
            "a version_regex is required with the 'regex' "
            "capture_instance version strategy"
        )
    if strategy not in (CREATE_DATE_STRATEGY, REGEX_STRATEGY):
        raise ValueError(f"capture instance version strategy {strategy!r} not recognized")
    inc = re.compile(include_regex, re.IGNORECASE) if include_regex else None
    exc = re.compile(exclude_regex, re.IGNORECASE) if exclude_regex else None
    ver = re.compile(version_regex) if version_regex else None

    by_table: dict[str, list[CaptureInstance]] = defaultdict(list)
    for ci in instances:
        if inc and not inc.match(ci.fq_name):
            continue
        if exc and exc.match(ci.fq_name):
            continue
        if ci.start_lsn is None or ci.create_date is None:
            continue  # brand-new instance: evaluate on the next pass
        by_table[ci.fq_name].append(ci)

    result: dict[str, CaptureInstance] = {}
    for fq_name, cis in by_table.items():
        if strategy == CREATE_DATE_STRATEGY:
            result[fq_name] = sorted(cis, key=lambda x: x.create_date)[-1]
        else:
            assert ver is not None

            def version_group(ci: CaptureInstance) -> str:
                m = ver.match(ci.capture_instance_name)
                return (m and m.group(1)) or ""

            result[fq_name] = sorted(cis, key=version_group)[-1]
    return result


# ---------------------------------------------------------------------------
# Clock-skew adjustment (clock_sync.py:24-43)
# ---------------------------------------------------------------------------


class ClockSync:
    """Periodically re-measured DB↔local clock skew, applied to DB-reported
    times. Pure logic with injectable clocks so it is fully testable without
    a database: ``db_now_fn`` runs ``db_time_sql()`` in a deployment;
    ``local_now_fn`` defaults to naive UTC now."""

    def __init__(
        self,
        db_now_fn: Callable[[], datetime.datetime],
        local_now_fn: Callable[[], datetime.datetime] | None = None,
        sync_interval: datetime.timedelta = DB_CLOCK_SYNC_INTERVAL,
    ) -> None:
        self._db_now_fn = db_now_fn
        self._local_now_fn = local_now_fn or (
            lambda: datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
        )
        self._sync_interval = sync_interval
        self._last_sync_time = self._local_now_fn()
        self._clock_skew = self._measure()

    def _measure(self) -> datetime.timedelta:
        return self._local_now_fn() - self._db_now_fn()

    def db_time_to_utc(self, db_time: datetime.datetime) -> datetime.datetime:
        """DB time + measured skew; the skew refreshes when older than the
        sync interval (clock_sync.py:25-30)."""
        now = self._local_now_fn()
        if (now - self._last_sync_time) > self._sync_interval:
            self._clock_skew = self._measure()
            self._last_sync_time = now
        return db_time + self._clock_skew
