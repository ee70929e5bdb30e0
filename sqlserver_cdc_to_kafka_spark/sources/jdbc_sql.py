"""T-SQL generation for tailing a real SQL Server via JDBC (SURVEY §2.1
S1/S2, §2.2 P4; deployment path of the keyset readers).

Against the driver's parquet fixtures the engine reads files; against a live
database the same operators become parameterized T-SQL issued by a JDBC
micro-batch puller. T-SQL has no row-value constructors, so the composite-key
tuple comparison ``(a, b) < (?, ?)`` is expanded to the standard
OR-of-ANDs staircase — semantically what Catalyst does natively for our
struct comparisons on the file path (the `val_key_range_count` query is the
equivalence proof between the two forms).

All SQL here is generated fresh from the key spec; queries use keyset seeks
(never OFFSET — page N costs the same as page 1) and deterministic ORDER BY.
"""

from __future__ import annotations

from collections.abc import Sequence


def quote(name: str) -> str:
    """Bracket-quote a T-SQL identifier (']' doubled)."""
    return "[" + name.replace("]", "]]") + "]"


def tuple_compare_sql(cols: Sequence[str], op: str) -> str:
    """P4: staircase expansion of ``(c0, c1, …) <op> (?, ?, …)``.

    op ∈ {'<', '>', '<=', '>='}. The non-strict forms expand as
    ``strict OR all-equal``. Placeholders appear once per referenced column,
    in column order per disjunct (caller binds the key tuple accordingly)."""
    if op not in ("<", ">", "<=", ">="):
        raise ValueError(f"unsupported comparator {op!r}")
    strict = op[0]
    disjuncts = []
    for i, col in enumerate(cols):
        eqs = [f"{quote(c)} = ?" for c in cols[:i]]
        disjuncts.append("(" + " AND ".join([*eqs, f"{quote(col)} {strict} ?"]) + ")")
    if op.endswith("="):
        disjuncts.append(
            "(" + " AND ".join(f"{quote(c)} = ?" for c in cols) + ")"
        )
    return "(" + " OR ".join(disjuncts) + ")"


def tuple_param_count(n_cols: int, op: str) -> int:
    """Number of '?' placeholders tuple_compare_sql emits."""
    strict = n_cols * (n_cols + 1) // 2
    return strict + (n_cols if op.endswith("=") else 0)


def snapshot_page_sql(
    schema: str,
    table: str,
    select_cols: Sequence[str],
    pk_cols: Sequence[str],
    batch_size: int,
    first_page: bool,
) -> str:
    """S2: one reverse-keyset snapshot page — TOP(n), PK tuple strictly below
    the previous page's last key, descending PK order (high→low so rows
    inserted after the snapshot started arrive via CDC only, T7)."""
    cols = ", ".join(quote(c) for c in select_cols)
    order = ", ".join(f"{quote(c)} DESC" for c in pk_cols)
    where = "" if first_page else f"WHERE {tuple_compare_sql(pk_cols, '<')} "
    return (
        f"SELECT TOP ({batch_size}) {cols} "
        f"FROM {quote(schema)}.{quote(table)} WITH (NOLOCK) "
        f"{where}ORDER BY {order}"
    )


def change_window_sql(
    capture_instance: str,
    select_cols: Sequence[str],
    batch_size: int,
) -> str:
    """S1: one incremental change-window pull from ``<ci>_CT`` — rows whose
    (start_lsn, seqval, operation) is strictly after the stored position and
    at or below the global max LSN ceiling, in change order, joined to
    ``lsn_time_mapping`` for the transaction end time. Binds: the position
    triple (expanded) then the ceiling."""
    idx_cols = ["__$start_lsn", "__$seqval", "__$operation"]
    cols = ", ".join(f"ct.{quote(c)}" for c in select_cols)
    after = tuple_compare_sql(idx_cols, ">").replace("[", "ct.[")
    order = ", ".join(f"ct.{quote(c)}" for c in idx_cols)
    return (
        f"SELECT TOP ({batch_size}) {cols}, "
        f"ct.[__$start_lsn], ct.[__$command_id], ct.[__$seqval], "
        f"ct.[__$operation], ct.[__$update_mask], ltm.[tran_end_time] "
        f"FROM [cdc].{quote(capture_instance + '_CT')} AS ct WITH (NOLOCK) "
        f"INNER JOIN [cdc].[lsn_time_mapping] AS ltm "
        f"ON ct.[__$start_lsn] = ltm.[start_lsn] "
        f"WHERE {after} AND ct.[__$start_lsn] <= ? "
        f"AND ct.[__$operation] <> 3 "
        f"ORDER BY {order}"
    )


def max_lsn_sql() -> str:
    """Global change ceiling for a poll cycle (T4 frontier input)."""
    return "SELECT sys.fn_cdc_get_max_lsn()"


def key_range_count_sql(
    schema: str, table: str, pk_cols: Sequence[str]
) -> str:
    """A4/P6: COUNT(*) within an inclusive PK tuple range."""
    lo = tuple_compare_sql(pk_cols, ">=")
    hi = tuple_compare_sql(pk_cols, "<=")
    return (
        f"SELECT COUNT(*) FROM {quote(schema)}.{quote(table)} WITH (NOLOCK) "
        f"WHERE {lo} AND {hi}"
    )


# ---------------------------------------------------------------------------
# Replayer deployment SQL (S11's T-SQL half; ``cdc_kafka/replayer.py``).
# The DataFrame-side semantics live in operators/replay.py (replay_merge);
# these generators produce the statements a live replayer issues against the
# target SQL Server: staging temp tables (replayer.py:355-371), the
# delete-batch join (replayer.py:373-380), the upsert MERGE including the
# all-PK insert-only edge case and IDENTITY_INSERT guard
# (replayer.py:382-416), and the progress-tracking MERGE
# (replayer.py:156-203).
# ---------------------------------------------------------------------------


def replay_staging_ddl_sql(
    schema: str,
    table: str,
    merge_temp: str,
    delete_temp: str,
    pk_col_specs: Sequence[str],
    pk_cols: Sequence[str],
    cols_to_not_sync: Sequence[str] = (),
) -> list[str]:
    """Staging DDL, one statement per list entry. The merge temp table is
    cloned from the target with the SELECT TOP 0 ... UNION ALL hack, which
    stops SQL Server from copying IDENTITY properties onto the clone
    (replayer.py:356-360); the delete temp table carries only the PK columns
    with an explicit primary key so the delete join is an index seek
    (replayer.py:364-371). ``pk_col_specs`` are full column definitions,
    e.g. ``'id int NOT NULL'``."""
    fq = f"{quote(schema)}.{quote(table)}"
    stmts = [
        f"DROP TABLE IF EXISTS {merge_temp};",
        (
            f"SELECT TOP 0 * INTO {merge_temp} FROM {fq} "
            f"UNION ALL SELECT * FROM {fq} WHERE 1 <> 1;"
        ),
    ]
    for c in cols_to_not_sync:
        stmts.append(f"ALTER TABLE {merge_temp} DROP COLUMN {quote(c)};")
    stmts.append(f"DROP TABLE IF EXISTS {delete_temp};")
    pk = ", ".join(quote(c) for c in pk_cols)
    stmts.append(
        f"CREATE TABLE {delete_temp} ({', '.join(pk_col_specs)}, "
        f"CONSTRAINT {quote('PK_' + delete_temp)} PRIMARY KEY ({pk}));"
    )
    return stmts


def replay_delete_sql(
    schema: str, table: str, delete_temp: str, pk_cols: Sequence[str]
) -> str:
    """One delete batch: join-delete the accumulated keys, then reset the
    staging table (replayer.py:373-380)."""
    preds = " AND ".join(f"tgt.{quote(c)} = dtt.{quote(c)}" for c in pk_cols)
    return (
        f"DELETE tgt FROM {quote(schema)}.{quote(table)} AS tgt "
        f"INNER JOIN {delete_temp} AS dtt ON ({preds}); "
        f"TRUNCATE TABLE {delete_temp};"
    )


def replay_merge_sql(
    schema: str,
    table: str,
    merge_temp: str,
    field_names: Sequence[str],
    pk_cols: Sequence[str],
    has_identity_col: bool = False,
) -> str:
    """One upsert batch: MERGE the staging rows into the target, then reset
    the staging table (replayer.py:391-416). When every column is part of
    the primary key, CDC models updates as delete+insert pairs and a
    ``WHEN MATCHED THEN UPDATE SET`` clause would be empty (syntactically
    invalid) — the statement degrades to insert-only (replayer.py:394-405).
    An IDENTITY column on the target requires IDENTITY_INSERT ON for the
    session (replayer.py:384-389)."""
    fq = f"{quote(schema)}.{quote(table)}"
    prefix = f"SET IDENTITY_INSERT {fq} ON; " if has_identity_col else ""
    on = " AND ".join(f"tgt.{quote(c)} = src.{quote(c)}" for c in pk_cols)
    insert_cols = ", ".join(quote(c) for c in field_names)
    insert_vals = ", ".join(f"src.{quote(c)}" for c in field_names)
    non_pk = [c for c in field_names if c not in pk_cols]
    matched = (
        ""
        if not non_pk
        else (
            "WHEN MATCHED THEN UPDATE SET "
            + ", ".join(f"{quote(c)} = src.{quote(c)}" for c in non_pk)
            + " "
        )
    )
    return (
        f"{prefix}MERGE {fq} AS tgt USING {merge_temp} AS src ON ({on}) "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals}); "
        f"TRUNCATE TABLE {merge_temp};"
    )


_PROGRESS_COLS = (
    "source_topic_name",
    "source_topic_partition",
    "target_table_object_id",
    "target_table_schema_name",
    "target_table_name",
    "last_handled_message_offset",
    "last_handled_message_timestamp",
    "commit_time",
    "replayer_progress_namespace",
    "replayer_process_id",
)

_PROGRESS_MATCH_COLS = (
    "source_topic_name",
    "target_table_object_id",
    "replayer_progress_namespace",
    "source_topic_partition",
)

_PROGRESS_UPDATE_COLS = (
    "last_handled_message_offset",
    "last_handled_message_timestamp",
    "commit_time",
    "replayer_process_id",
)


def replay_progress_merge_sql(progress_schema: str, progress_table: str) -> str:
    """Per-partition progress commit (replayer.py:156-203): MERGE keyed on
    (topic, target object id, namespace, partition). Ten '?' binds in
    order: topic, partition, schema, table (those two again inside
    OBJECT_ID, then as plain columns — JDBC placeholders are positional, so
    the reference's reused :2/:3 params appear twice), offset, timestamp,
    namespace, process id. Object id and commit time are computed
    server-side (OBJECT_ID(), GETDATE())."""
    fq = f"{quote(progress_schema)}.{quote(progress_table)}"
    using = (
        "SELECT ? AS [source_topic_name], ? AS [source_topic_partition], "
        "OBJECT_ID(? + '.' + ?) AS [target_table_object_id], "
        "? AS [target_table_schema_name], ? AS [target_table_name], "
        "? AS [last_handled_message_offset], "
        "? AS [last_handled_message_timestamp], "
        "GETDATE() AS [commit_time], "
        "? AS [replayer_progress_namespace], ? AS [replayer_process_id]"
    )
    on = " AND ".join(f"pt.{quote(c)} = row.{quote(c)}" for c in _PROGRESS_MATCH_COLS)
    update = ", ".join(f"{quote(c)} = row.{quote(c)}" for c in _PROGRESS_UPDATE_COLS)
    insert_cols = ", ".join(quote(c) for c in _PROGRESS_COLS)
    insert_vals = ", ".join(f"row.{quote(c)}" for c in _PROGRESS_COLS)
    return (
        f"MERGE {fq} AS pt USING ({using}) AS row ON ({on}) "
        f"WHEN MATCHED THEN UPDATE SET {update} "
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals});"
    )
