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
