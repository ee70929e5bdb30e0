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


# ---------------------------------------------------------------------------
# Replayer deployment SQL (S11's T-SQL half)
# ---------------------------------------------------------------------------

from sqlserver_cdc_to_kafka_spark.sources.jdbc_sql import (  # noqa: E402
    replay_delete_sql,
    replay_merge_sql,
    replay_progress_merge_sql,
    replay_staging_ddl_sql,
)


def test_replay_staging_ddl_shapes():
    stmts = replay_staging_ddl_sql(
        "dbo", "orders", "#orders_merge", "#orders_delete",
        ["[id] int NOT NULL"], ["id"], cols_to_not_sync=["rowver"],
    )
    assert stmts[0] == "DROP TABLE IF EXISTS #orders_merge;"
    # the IDENTITY-stripping clone hack: TOP 0 UNION ALL an empty select
    assert "SELECT TOP 0 * INTO #orders_merge" in stmts[1]
    assert "UNION ALL SELECT * FROM [dbo].[orders] WHERE 1 <> 1" in stmts[1]
    assert stmts[2] == "ALTER TABLE #orders_merge DROP COLUMN [rowver];"
    assert "CREATE TABLE #orders_delete" in stmts[4]
    assert "PRIMARY KEY ([id])" in stmts[4]


def test_replay_merge_sql_shapes():
    full = replay_merge_sql("dbo", "t", "#m", ["id", "v"], ["id"])
    assert "WHEN MATCHED THEN UPDATE SET [v] = src.[v]" in full
    assert "WHEN NOT MATCHED THEN INSERT ([id], [v])" in full
    assert full.rstrip().endswith("TRUNCATE TABLE #m;")
    assert "IDENTITY_INSERT" not in full
    # all-PK edge case: an UPDATE SET would be empty/invalid -> insert-only
    pk_only = replay_merge_sql("dbo", "t", "#m", ["a", "b"], ["a", "b"])
    assert "WHEN MATCHED" not in pk_only
    assert "WHEN NOT MATCHED THEN INSERT ([a], [b])" in pk_only
    ident = replay_merge_sql("dbo", "t", "#m", ["id", "v"], ["id"],
                             has_identity_col=True)
    assert ident.startswith("SET IDENTITY_INSERT [dbo].[t] ON; ")


def test_replay_progress_merge_shape():
    sql = replay_progress_merge_sql("dbo", "replayer_progress")
    assert sql.count("?") == 10
    assert "OBJECT_ID(? + '.' + ?)" in sql
    assert "GETDATE() AS [commit_time]" in sql
    for c in ("source_topic_name", "target_table_object_id",
              "replayer_progress_namespace", "source_topic_partition"):
        assert f"pt.[{c}] = row.[{c}]" in sql


def _tsql_to_duckdb(sql: str) -> str:
    """Mechanical T-SQL -> DuckDB translation for semantic testing only:
    strip bracket quoting and temp-table '#', rewrite the delete join."""
    return sql.replace("[", "").replace("]", "").replace("#", "tmp_")


def test_replay_delete_sql_semantics_duckdb():
    """Run the generated delete batch in DuckDB (DELETE..USING spelling of
    the same join) and check only the staged keys are deleted."""
    sql = replay_delete_sql("main", "tgt", "#del", ["a", "b"])
    assert "DELETE tgt FROM [main].[tgt] AS tgt" in sql
    assert "TRUNCATE TABLE #del;" in sql
    con = duckdb.connect()
    con.execute("CREATE TABLE tgt(a INT, b INT, v TEXT)")
    con.execute("INSERT INTO tgt VALUES (1,1,'k'),(1,2,'d'),(2,1,'d'),(2,2,'k')")
    con.execute("CREATE TABLE tmp_del(a INT, b INT)")
    con.execute("INSERT INTO tmp_del VALUES (1,2),(2,1)")
    delete_stmt, truncate_stmt = _tsql_to_duckdb(sql).split("; ", 1)
    # T-SQL 'DELETE tgt FROM x AS tgt INNER JOIN y AS dtt ON (p)' ==
    # standard 'DELETE FROM x AS tgt USING y AS dtt WHERE p'
    preds = delete_stmt.split(" ON (", 1)[1].rstrip(")")
    con.execute(f"DELETE FROM tgt USING tmp_del AS dtt WHERE {preds}")
    con.execute(truncate_stmt)
    assert con.execute("SELECT a, b FROM tgt ORDER BY a").fetchall() == [
        (1, 1), (2, 2)
    ]
    assert con.execute("SELECT COUNT(*) FROM tmp_del").fetchone()[0] == 0


def test_replay_merge_sql_semantics_duckdb():
    """Execute the MERGE's two arms (UPDATE..FROM for MATCHED, anti-join
    INSERT for NOT MATCHED — the standard rewrite) in DuckDB using the
    predicates/column lists parsed from the generated statement; the final
    state must equal the replay upsert contract."""
    sql = replay_merge_sql("main", "tgt", "#m", ["id", "v", "w"], ["id"])
    con = duckdb.connect()
    con.execute("CREATE TABLE tgt(id INT, v TEXT, w INT)")
    con.execute("INSERT INTO tgt VALUES (1,'old',10),(3,'keep',30)")
    con.execute("CREATE TABLE tmp_m(id INT, v TEXT, w INT)")
    con.execute("INSERT INTO tmp_m VALUES (1,'new',11),(9,'ins',90)")
    d = _tsql_to_duckdb(sql)
    on = d.split(" ON (", 1)[1].split(")", 1)[0]
    set_clause = d.split("UPDATE SET ", 1)[1].split(" WHEN NOT MATCHED", 1)[0]
    con.execute(f"UPDATE tgt SET {set_clause.replace('src.', 'tmp_m.')} "
                f"FROM tmp_m WHERE {on.replace('tgt.', 'tgt.').replace('src.', 'tmp_m.')}")
    con.execute(f"INSERT INTO tgt SELECT id, v, w FROM tmp_m AS src "
                f"WHERE NOT EXISTS (SELECT 1 FROM tgt WHERE {on})")
    assert con.execute("SELECT * FROM tgt ORDER BY id").fetchall() == [
        (1, "new", 11), (3, "keep", 30), (9, "ins", 90)
    ]
