"""JDBC T-SQL generation tests: structural properties + semantic equivalence
of the staircase tuple predicate against native row-value comparison."""

from __future__ import annotations

import duckdb
import pytest

from sqlserver_cdc_to_kafka_spark.sources.jdbc_sql import (
    change_window_sql,
    key_range_count_sql,
    max_lsn_sql,
    quote,
    snapshot_page_sql,
    tuple_compare_sql,
    tuple_param_count,
)


def test_quote_escapes_brackets():
    assert quote("a]b") == "[a]]b]"
    assert quote("plain") == "[plain]"


def test_tuple_compare_shapes():
    sql = tuple_compare_sql(["a", "b", "c"], "<")
    assert sql.count("?") == 6 == tuple_param_count(3, "<")
    assert sql.count(" OR ") == 2
    sql_le = tuple_compare_sql(["a", "b"], "<=")
    assert sql_le.count("?") == 5 == tuple_param_count(2, "<=")
    with pytest.raises(ValueError):
        tuple_compare_sql(["a"], "!=")


@pytest.mark.parametrize("op", ["<", ">", "<=", ">="])
def test_tuple_compare_matches_row_value_semantics(op, sf_dir):
    """Evaluate the staircase (placeholders bound to a literal key) in DuckDB
    and compare against DuckDB's native row-value comparison on lineitem."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW t AS SELECT l_orderkey AS a, l_linenumber AS b "
        f"FROM '{sf_dir}/lineitem.parquet'"
    )
    key = (1000, 3)
    stair = tuple_compare_sql(["a", "b"], op)
    binds = []
    n = tuple_param_count(2, op)
    # bind order: per disjunct, referenced columns in order
    if op[0] == "<" or op[0] == ">":
        binds = [key[0], key[0], key[1]]
        if op.endswith("="):
            binds += [key[0], key[1]]
    stair_lit = stair.replace("[", "").replace("]", "")
    for v in binds:
        stair_lit = stair_lit.replace("?", str(v), 1)
    assert len(binds) == n
    got = con.execute(f"SELECT COUNT(*) FROM t WHERE {stair_lit}").fetchone()[0]
    want = con.execute(
        f"SELECT COUNT(*) FROM t WHERE (a, b) {op} (1000, 3)"
    ).fetchone()[0]
    assert got == want and want > 0


def test_snapshot_page_sql_shape():
    first = snapshot_page_sql("dbo", "orders", ["id", "v"], ["id"], 2000, True)
    assert "TOP (2000)" in first and "OFFSET" not in first
    assert first.strip().endswith("ORDER BY [id] DESC")
    assert "WHERE" not in first
    later = snapshot_page_sql("dbo", "t", ["a", "b", "v"], ["a", "b"], 500, False)
    assert "WHERE" in later and later.count("?") == 3
    assert "[a] DESC, [b] DESC" in later


def test_change_window_sql_shape():
    sql = change_window_sql("dbo_orders", ["id", "v"], 2000)
    assert "TOP (2000)" in sql and "OFFSET" not in sql
    assert "[cdc].[dbo_orders_CT]" in sql
    assert "lsn_time_mapping" in sql  # J1 join
    assert "<> 3" in sql  # P3: PreUpdate filtered
    # position triple staircase (6 binds) + ceiling (1)
    assert sql.count("?") == 7
    assert sql.rstrip().endswith(
        "ORDER BY ct.[__$start_lsn], ct.[__$seqval], ct.[__$operation]"
    )


def test_key_range_and_max_lsn():
    sql = key_range_count_sql("dbo", "t", ["a", "b"])
    assert sql.count("?") == 10  # two non-strict staircases
    assert "fn_cdc_get_max_lsn" in max_lsn_sql()
