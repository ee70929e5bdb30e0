"""OLAP widening pack: the remaining classic TPC-H plan shapes, adapted to
the driver's slimmer schemas (no partsupp / commitdate / shipmode — each
query's docstring names its substitution).

Why these matter for the engine: together with queries/analytics.py this
covers every distinct Catalyst plan class a downstream consumer of the
materialized CDC tables will throw at it — semi/anti joins (EXISTS / NOT
EXISTS / NOT IN rewrites), outer-join count distributions, scalar-subquery
rewrites as broadcast one-row joins, OR-of-ANDs pushdown, group-filter
(HAVING) pipelines, and conditional aggregation.  Each is written
Spark-first: correlated subqueries become joins/aggregations (the rewrite
Catalyst itself would do), scalar subqueries become broadcast 1-row joins,
and decimal casts keep the hash gate engine-exact."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.registry import query
from sqlserver_cdc_to_kafka_spark.tables import load_table


def _dec(c: str):
    return F.col(c).cast("decimal(18,2)")


@query(
    "olap_forecast_revenue",
    bench=True,  # the pure-scan cost class: pushdown + pruning dominate
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate — the scan-efficiency
    probe.  All three predicates push into the parquet reader (PushedFilters
    on l_shipdate/l_discount/l_quantity); the whole query is one map-side
    partial + a 1-row final, no meaningful shuffle.  At 100 TB this is the
    query where column pruning (2 of 11 columns read) dominates."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "olap_order_priority_check",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
)
def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → LEFT SEMI join (the
    rewrite Catalyst performs; written directly as one).  Substitution: no
    l_commitdate/l_receiptdate in this schema, so 'late' is l_returnflag='R'.
    The returnflag filter pushes below the semi join, shrinking its build
    side before the shuffle; the date window pushes into the orders scan."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    late = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "olap_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       ROUND(c_acctbal, 2) AS c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    bench=True,
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter — 4-way
    join, selective fact filters pushed to both scans, top-20 by aggregate.
    nation is constant-cardinality (broadcast hint); customer scales with SF
    so its join is AQE-decided.  TakeOrderedAndProject caps the sort at 20
    rows per partition — no global sort of the aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "olap_priority_line_mix",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
""",
)
def q_priority_line_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional aggregation (CASE-sum pivot).
    Substitution: no l_shipmode column, so the group key is l_linestatus.
    The date window pushes into the lineitem scan; the two conditional sums
    are one pass (a single hash aggregate with two CASE expressions), not
    two filtered scans."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "olap_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey) per_cust
GROUP BY c_count
""",
    bench=True,
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: outer join with an ON-clause (not WHERE) filter on
    the null-producing side, then a two-level aggregation — the count-of-
    counts distribution.  COUNT(o_orderkey) over the outer join counts 0 for
    order-less customers (nulls don't count), which a WHERE filter would
    silently drop — the classic outer-join-filter placement trap, pinned by
    the oracle.  Second aggregate's input is one row per customer — tiny."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "olap_promo_revenue",
    oracle="""
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))
                     ELSE 0 END) * 1000000 AS BIGINT) AS promo_micros,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 1000000 AS BIGINT)
         AS total_micros
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
""",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-revenue share — fact⋈dim join feeding a
    conditional aggregate.  part is a dim that scales with SF, so the join
    is AQE-decided (broadcast while small).  Both sums come out as exact
    integer micro-units (decimal scaled), so the hash gate never sees an
    engine-specific double division; the ratio is one client-side divide."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (F.sum(F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0))) * 1_000_000)
            .cast("bigint")
            .alias("promo_micros"),
            (F.sum(disc_price) * 1_000_000).cast("bigint").alias("total_micros"),
        )
    )


@query(
    "olap_parts_supplier_count",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier-diversity count with a NOT IN exclusion.
    Substitution: no partsupp table, so lineitem's (partkey, suppkey) pairs
    ARE the part-supplier relation.  NOT IN over a non-null key column is a
    LEFT ANTI join (the null-safe rewrite is unnecessary here and its
    null-check would block the anti-join optimization); the excluded-
    supplier set scales with SF (~a tenth of suppliers), so its broadcast
    is AQE-decided, never a hard hint.  COUNT(DISTINCT) expands to a
    two-phase aggregate — partial distinct per partition, then final."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 25)
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "olap_large_volume_customer",
    oracle="""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
SELECT c_custkey, c_name, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, sum_qty
FROM big JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
""",
    bench=True,
)
def q_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING group filter → join back to the dims.  The
    aggregate runs FIRST, shrinking lineitem from rows to qualifying order
    keys before either join — the group-filter pushup that makes this cheap
    at 100 TB (the alternative, join-then-aggregate, shuffles the full
    join product).  Threshold 150 ≈ top few % of orders at 4 lines/order,
    qty ≤ 50."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 150)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("sum_qty"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


@query(
    "olap_discounted_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
)
def q_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides.  The mixed
    predicate can't be pushed whole, but its per-side residuals can:
    Catalyst derives l_quantity BETWEEN 1 AND 30 for the lineitem scan and
    p_brand IN (...) for the part scan from the disjunction, then applies
    the exact cross-side condition on the joined rows.  Written as a plain
    equi-join + composite filter so that derivation stays visible to the
    optimizer (NOT as three unioned joins, which would triple the scan)."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & (q >= 20) & (q <= 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "olap_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
""",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: scalar subquery (global MAX over a derived view)
    used as a filter.  Spark-first rewrite: the 1-row MAX aggregate joins
    back by equality as a broadcast — never a window over an unpartitioned
    frame (Window.partitionBy() would funnel every supplier through one
    task).  Decimal equality keeps the max-match exact; ties all surface
    (same semantics as the SQL)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("total_rev")
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top), rev.total_rev == top.max_rev)
        .join(supp, rev.supplier_no == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


@query(
    "olap_suppliers_kept_waiting",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
""",
)
def q_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole-blame query — suppliers whose line was the
    ONLY returned one on a multi-supplier finalized order.  Substitution:
    l_returnflag='R' stands in for receipt-after-commit lateness.

    Spark-first rewrite: the correlated EXISTS / NOT EXISTS pair over
    lineitem self-joins collapses into ONE aggregation per order —
    n_supp = countDistinct(suppkey) and n_bad_supp = countDistinct(suppkey
    WHERE 'R') — then a single equi-join.  EXISTS(other supplier) ⇔
    n_supp > 1; NOT EXISTS(other bad supplier) ⇔ n_bad_supp = 1 (l1 itself
    is bad).  Two lineitem scans total (l1 + the aggregate) instead of the
    three the literal SQL implies, and no exploding self-join pair space."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy(F.col("l_orderkey").alias("agg_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_bad_supp"),
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        l1.join(orders_f, l1.l_orderkey == orders_f.o_orderkey)
        .join(per_order, l1.l_orderkey == per_order.agg_orderkey)
        .filter((F.col("n_supp") > 1) & (F.col("n_bad_supp") == 1))
        .join(supp, l1.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "olap_global_sales_opportunity",
    oracle="""
WITH pos AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS bal_sum,
         COUNT(*) AS bal_cnt
  FROM customer WHERE c_acctbal > 0)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, pos
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * bal_cnt > bal_sum
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey
""",
)
def q_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers above the average positive balance with no
    RECENT orders — scalar AVG subquery + NOT EXISTS anti-join.
    Substitutions: c_nationkey groups instead of the phone country code (no
    c_phone), and the no-orders test is scoped to orders since 1999 (the
    synthetic data gives nearly every customer SOME order, which would make
    the unscoped anti-join vacuously empty — a 0-row oracle witnesses
    nothing).

    The average is compared WITHOUT division: bal * count > sum in exact
    decimal arithmetic, so no engine-specific float-division rounding can
    flip a boundary row (AVG of doubles is summation-order-dependent — a
    real cross-engine hazard, not a theoretical one).  The 1-row aggregate
    broadcasts; NOT EXISTS is a LEFT ANTI join on the order keys."""
    cust = load_table(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_dec("c_acctbal")).cast("decimal(28,2)").alias("bal_sum"),
        F.count("*").alias("bal_cnt"),
    )
    orders_keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(pos))
        .filter(_dec("c_acctbal") * F.col("bal_cnt") > F.col("bal_sum"))
        .join(orders_keys, cust.c_custkey == orders_keys.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@query(
    "olap_pivot_priority_matrix",
    oracle="""
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
            AS BIGINT) AS urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
            AS BIGINT) AS high,
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END)
            AS BIGINT) AS medium,
       CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END)
            AS BIGINT) AS unspecified,
       CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)
            AS BIGINT) AS low
FROM orders GROUP BY o_orderstatus
""",
)
def q_pivot_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts as a status × priority matrix via the DataFrame
    pivot() operator WITH the pivot values declared up front — omitting
    them makes Spark run a hidden distinct-collect job over the column
    first, a full extra scan at 100 TB for something the caller already
    knows.  Declared values compile to exactly the oracle's CASE-sum
    single-pass aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderstatus")
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .agg(F.count(F.lit(1)))  # pivot rejects the count(*) star form
    )
    renames = {
        "1-URGENT": "urgent",
        "2-HIGH": "high",
        "3-MEDIUM": "medium",
        "4-NOT SPECIFIED": "unspecified",
        "5-LOW": "low",
    }
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    # pivot emits NULL for empty cells where CASE-sum emits 0
    return out.select(
        "o_orderstatus",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in renames.values()],
    )


@query(
    "olap_rollup_revenue",
    oracle="""
SELECT COALESCE(n_name, '<all>') AS n_name,
       COALESCE(CAST(year(o_orderdate) AS VARCHAR), '<all>') AS order_year,
       GROUPING(n_name, year(o_orderdate)) AS grouping_lvl,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, year(o_orderdate))
""",
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: revenue at (nation, year), per-nation subtotal,
    and grand total in ONE aggregation — Spark expands the three grouping
    sets inside a single Expand+HashAggregate (one scan, one shuffle),
    exactly what three unioned GROUP BYs would cost in scans.  grouping_id
    distinguishes a real NULL key from a subtotal row; the string COALESCE
    makes the subtotal labels explicit and hash-stable across engines."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    yr = F.year("o_orderdate")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .rollup(F.col("n_name"), yr.alias("order_year"))
        .agg(
            F.grouping_id().alias("grouping_lvl"),
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("n_name", F.lit("<all>")).alias("n_name"),
            F.coalesce(F.col("order_year").cast("string"), F.lit("<all>")).alias(
                "order_year"
            ),
            "grouping_lvl",
            "n_orders",
            "revenue",
        )
    )


@query(
    "olap_cheapest_supplier_per_part",
    oracle="""
WITH priced AS (
  SELECT l_partkey, l_suppkey,
         l_extendedprice / l_quantity AS unit_price
  FROM lineitem WHERE l_quantity > 0),
best AS (SELECT l_partkey, MIN(unit_price) AS min_price
         FROM priced GROUP BY l_partkey)
SELECT p.l_partkey AS p_partkey, p_name,
       CAST(MIN(l_suppkey) AS BIGINT) AS best_suppkey,
       CAST(FLOOR(min_price * 1000000 + 0.5) AS BIGINT) AS min_unit_price_micros
FROM priced p
JOIN best b ON p.l_partkey = b.l_partkey AND p.unit_price = b.min_price
JOIN part ON p.l_partkey = part.p_partkey
GROUP BY p.l_partkey, p_name, min_price
""",
)
def q_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated MIN subquery), sans partsupp: per part,
    the supplier offering the minimum observed unit price.  The argmin is
    TWO aggregates with a join-back on the exact min — NOT min_by/arg_min,
    which tie-break nondeterministically in both engines and would flake
    the hash gate; MIN(suppkey) at the min price makes ties total.  The
    unit-price double division is a single IEEE op, so the equality
    join-back matches bit-for-bit cross-engine.  Both aggs and the join
    share the l_partkey shuffle key — co-partitioned, one real exchange.

    The exposed price is integer MICROS via floor(x*1e6 + 0.5), not
    ROUND(x, 6): at sf0.1 three parts have a min price on an exact
    half-boundary (e.g. 133.7415625) where Spark's BigDecimal HALF_UP and
    DuckDB's float rounding disagree in the 6th decimal — floor of the
    identical double is engine-portable (the repo-wide quantize idiom)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    priced = li.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    # best derives from the same scan as priced — rename its key so the
    # self-join is unambiguous
    best = priced.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_price").alias("min_price")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        priced.join(
            best,
            (priced.l_partkey == best.b_partkey)
            & (priced.unit_price == best.min_price),
        )
        .join(part, priced.l_partkey == part.p_partkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"), "p_name", "min_price")
        .agg(F.min("l_suppkey").cast("bigint").alias("best_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "best_suppkey",
            F.floor(F.col("min_price") * 1_000_000 + F.lit(0.5))
            .cast("bigint")
            .alias("min_unit_price_micros"),
        )
    )


@query(
    "olap_customer_value_deciles",
    oracle="""
WITH spend AS (
  SELECT c_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_spend
  FROM customer JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey),
tiled AS (
  SELECT c_custkey, total_spend,
         ntile(10) OVER (ORDER BY total_spend DESC, c_custkey) AS decile
  FROM spend)
SELECT CAST(decile AS BIGINT) AS decile, COUNT(*) AS n_customers,
       CAST(MIN(total_spend) AS DOUBLE) AS min_spend,
       CAST(MAX(total_spend) AS DOUBLE) AS max_spend,
       CAST(SUM(total_spend) AS DOUBLE) AS decile_spend
FROM tiled GROUP BY decile
""",
)
def q_customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value decile segmentation: spend per customer, ntile(10)
    over the (spend DESC, custkey) total order, envelope stats per decile.
    The ntile is EXACT ntile(10) semantics computed scalably via
    global_ntile (range-bucketed rank + the SQL-standard tile formula,
    equality-pinned to F.ntile) — the plain unpartitioned ntile window
    funnels one row per customer (~1e9 at scale) through a single task;
    the tie-broken (spend DESC, custkey) total order keeps the
    assignment deterministic."""
    from sqlserver_cdc_to_kafka_spark.operators.merge import global_ntile

    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .groupBy("c_custkey")
        .agg(F.sum(_dec("o_totalprice")).alias("total_spend"))
    )
    return (
        global_ntile(
            spend,
            [(-F.col("total_spend")).alias("o1"), F.col("c_custkey")],
            (-F.col("total_spend")).cast("double"),
            10,
            "decile",
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.min("total_spend").cast("double").alias("min_spend"),
            F.max("total_spend").cast("double").alias("max_spend"),
            F.sum("total_spend").cast("double").alias("decile_spend"),
        )
    )


@query(
    "olap_nation_market_share",
    oracle="""
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                     THEN CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))
                     ELSE 0 END) * 1000000 AS BIGINT) AS nation_micros,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 1000000
            AS BIGINT) AS total_micros
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'ASIA'
GROUP BY 1
""",
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a region's revenue
    per year — 7-way join with TWO roles for nation (customer side walks
    region, supplier side is the share subject), conditional aggregation
    on the second role.  Both nation aliases broadcast (25 rows); customer
    and supplier joins are AQE-decided.  Share emitted as exact micro-unit
    numerator/denominator (one client-side divide), never a float division
    inside the hash gate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", disc_price).otherwise(
                        F.lit(0)
                    )
                )
                * 1_000_000
            )
            .cast("bigint")
            .alias("nation_micros"),
            (F.sum(disc_price) * 1_000_000).cast("bigint").alias("total_micros"),
        )
    )


@query(
    "olap_profit_by_nation_year",
    oracle="""
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2)) / 10) * 1000000
            AS BIGINT) AS profit_micros
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE contains(p_name, 'a')
GROUP BY 1, 2
""",
)
def q_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year over parts
    matching a name filter.  Substitution: no partsupp.ps_supplycost, so
    unit cost is p_retailprice/10 — same join topology and arithmetic
    shape (revenue minus quantity×cost), different constant.  Decimal
    division by the exact power of ten keeps the micro-unit sum engine-
    exact; the substring filter prunes part before its join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("a")
    ).select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _dec("l_extendedprice") * (1 - _dec("l_discount")) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity") / 10
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg((F.sum(profit) * 1_000_000).cast("bigint").alias("profit_micros"))
    )


@query(
    "audit_constraint_report",
    oracle="""
SELECT * FROM (
  SELECT 'orders_pk_unique' AS check_name,
         (SELECT COUNT(*) FROM
            (SELECT o_orderkey FROM orders
             GROUP BY o_orderkey HAVING COUNT(*) > 1) d) AS n_violations,
         (SELECT COUNT(*) FROM orders) AS n_checked
  UNION ALL
  SELECT 'lineitem_fk_orders',
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey)),
         (SELECT COUNT(*) FROM lineitem)
  UNION ALL
  SELECT 'orders_fk_customer',
         (SELECT COUNT(*) FROM orders
          WHERE NOT EXISTS (SELECT 1 FROM customer
                            WHERE c_custkey = o_custkey)),
         (SELECT COUNT(*) FROM orders)
  UNION ALL
  SELECT 'lineitem_qty_range',
         (SELECT COUNT(*) FROM lineitem
          WHERE l_quantity IS NULL OR l_quantity <= 0 OR l_quantity > 50),
         (SELECT COUNT(*) FROM lineitem)
  UNION ALL
  SELECT 'lineitem_discount_range',
         (SELECT COUNT(*) FROM lineitem
          WHERE l_discount IS NULL OR l_discount < 0 OR l_discount > 0.2),
         (SELECT COUNT(*) FROM lineitem)
  UNION ALL
  SELECT 'orders_date_not_null',
         (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL),
         (SELECT COUNT(*) FROM orders)) r
""",
)
def q_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (the dbt-test / Deequ constraint
    class): PK uniqueness, two FK referential checks, range and null-rate
    checks, one row per constraint.  Each check is the scalable idiom for
    its class — uniqueness via groupBy-HAVING (not distinct-count compare,
    which can't say WHICH keys violate), referential integrity via LEFT
    ANTI join (never a NOT IN over a scaling subquery — null-safe NOT IN
    degenerates to a nested-loop), ranges as pushed-down filters.  The
    per-check scans share nothing by design: at 100 TB you run the checks
    you need, and each is one pruned scan."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")

    def report(name: str, violations: DataFrame, checked: DataFrame) -> DataFrame:
        v = violations.agg(F.count("*").alias("n_violations"))
        c = checked.agg(F.count("*").alias("n_checked"))
        return v.crossJoin(c).select(
            F.lit(name).alias("check_name"), "n_violations", "n_checked"
        )

    dup_pk = (
        orders.groupBy("o_orderkey").agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
    fk_li = li.join(
        orders.select("o_orderkey"), li.l_orderkey == orders.o_orderkey, "left_anti"
    )
    fk_ord = orders.join(
        cust.select("c_custkey"), orders.o_custkey == cust.c_custkey, "left_anti"
    )
    bad_qty = li.filter(
        F.col("l_quantity").isNull()
        | (F.col("l_quantity") <= 0)
        | (F.col("l_quantity") > 50)
    )
    bad_disc = li.filter(
        F.col("l_discount").isNull()
        | (F.col("l_discount") < 0)
        | (F.col("l_discount") > 0.2)
    )
    null_date = orders.filter(F.col("o_orderdate").isNull())
    out = report("orders_pk_unique", dup_pk, orders)
    for name, viol, base in [
        ("lineitem_fk_orders", fk_li, li),
        ("orders_fk_customer", fk_ord, orders),
        ("lineitem_qty_range", bad_qty, li),
        ("lineitem_discount_range", bad_disc, li),
        ("orders_date_not_null", null_date, orders),
    ]:
        out = out.unionByName(report(name, viol, base))
    return out


_SQL_WITNESS = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS sum_disc_price,
       COUNT(*) AS count_order,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("sql_api_pricing_witness", oracle=_SQL_WITNESS)
def q_sql_api_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-API entry path witness: the SAME ANSI text runs through
    ``spark.sql`` over registered views AND through DuckDB — one string,
    two engines, hash-equal results.  Everything else in the registry is
    DataFrame-API; this pins that a SQL-first user of the engine (BI
    tools, dbt models) gets identical semantics, including decimal
    aggregation, timestamp literals against the NTZ-read parquet columns,
    and COUNT(DISTINCT).  Catalyst plans the text identically to the
    DataFrame form (same pushdown + partial aggregates — see
    olap_pricing_summary's plan)."""
    from sqlserver_cdc_to_kafka_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_WITNESS)


@query(
    "olap_small_quantity_revenue",
    oracle="""
WITH stats AS (
  SELECT l_partkey AS sp,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS qsum,
         COUNT(*) AS qcnt
  FROM lineitem GROUP BY 1)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
JOIN stats ON sp = l_partkey
WHERE p_brand = 'Brand#23'
  AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * qcnt < qsum
""",
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines below 20% of their part's average quantity —
    the correlated scalar-AVG-per-group subquery, rewritten as one
    aggregate + join-back (the decorrelation Catalyst would apply).  The
    20%-of-average compare runs WITHOUT division: qty·5·count < sum in
    exact decimal (same no-division trick as Q22's global average) — a
    float avg is summation-order-dependent and a boundary line could flip
    between engines.  Both the stats aggregate and the join share the
    l_partkey shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy(F.col("l_partkey").alias("sp")).agg(
        F.sum(_dec("l_quantity")).cast("decimal(28,2)").alias("qsum"),
        F.count("*").alias("qcnt"),
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(stats, li.l_partkey == stats.sp)
        .filter(_dec("l_quantity") * 5 * F.col("qcnt") < F.col("qsum"))
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "olap_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 1000000
            AS BIGINT) AS revenue_micros
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
""",
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations (the synthetic NATION_1/NATION_2) by ship year — the two-role nation join with a symmetric pair predicate.  The
    nation filters reduce each broadcast side to one row before the big
    joins, so the OR-pair predicate evaluates against two 1-row dims, not
    post-join; supplier/customer joins stay AQE-decided; micro-unit sums
    keep the gate exact."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    n1 = pair.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = pair.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            (F.sum(disc_price) * 1_000_000).cast("bigint").alias("revenue_micros")
        )
    )


@query(
    "maintenance_compaction_plan",
    bench=True,
    oracle="""
WITH listing AS (
  SELECT source, 'doc_' || CAST(doc_id AS VARCHAR) AS file, n_chars AS bytes
  FROM documents),
planned AS (
  SELECT source, file, bytes,
         COALESCE(SUM(bytes) OVER (PARTITION BY source
                                   ORDER BY bytes DESC, file
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING), 0)
           // 65536 AS compact_group
  FROM listing)
SELECT source, CAST(compact_group AS BIGINT) AS compact_group,
       COUNT(*) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS group_bytes
FROM planned GROUP BY 1, 2
""",
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (operators/maintenance.py): the
    documents table stands in for a file listing (source = partition dir,
    n_chars = file bytes); the planner's prefix-sum bin-pack groups files
    into ~64 KB compaction jobs per partition in ONE window pass — no
    driver-side loop, deterministic across runs, group totals bounded by
    target + max file.  The query reports the plan's group shapes (file
    count + bytes per group), which is what a maintenance scheduler
    consumes."""
    from sqlserver_cdc_to_kafka_spark.operators.maintenance import (
        plan_compaction,
    )

    listing = load_table(spark, sf_dir, "documents").select(
        "source",
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string")).alias("file"),
        F.col("n_chars").alias("bytes"),
    )
    plan = plan_compaction(
        listing, ["source"], "bytes", "file", target_bytes=65536
    )
    return plan.groupBy("source", "compact_group").agg(
        F.count("*").alias("n_files"),
        F.sum("bytes").cast("bigint").alias("group_bytes"),
    )


@query(
    "olap_cube_status_priority",
    oracle="""
SELECT COALESCE(o_orderstatus, '<all>') AS o_orderstatus,
       COALESCE(o_orderpriority, '<all>') AS o_orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS grouping_lvl,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all four aggregation granularities of
    (status, priority) — both margins and the grand total — in ONE
    Expand+HashAggregate pass (vs four unioned scans).  ROLLUP
    (olap_rollup_revenue) covers the hierarchy direction; CUBE is the
    cross-tab direction every BI layer generates.  grouping_id
    disambiguates subtotal rows from real NULL keys."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("grouping_lvl"),
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("o_orderpriority"),
            "grouping_lvl",
            "n_orders",
            "revenue",
        )
    )


@query(
    "olap_multiset_except",
    oracle="""
WITH returned AS (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
finished AS (SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'),
diff AS (SELECT l_orderkey FROM returned EXCEPT ALL
         SELECT l_orderkey FROM finished),
isect AS (SELECT l_orderkey FROM returned INTERSECT ALL
          SELECT l_orderkey FROM finished)
SELECT (SELECT COUNT(*) FROM returned) AS n_returned,
       (SELECT COUNT(*) FROM finished) AS n_finished,
       (SELECT COUNT(*) FROM diff) AS n_except_all,
       (SELECT COUNT(*) FROM isect) AS n_intersect_all,
       (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey FROM diff) d)
         AS n_except_keys
""",
)
def q_multiset_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set operations: EXCEPT ALL / INTERSECT ALL preserve
    duplicate multiplicity (per key: max(m−n, 0) and min(m, n) copies) —
    semantics a DISTINCT-based except silently changes, and exactly what
    reconciliation of at-least-once feeds needs (how many EXTRA copies,
    not just which keys).  Spark's exceptAll/intersectAll lower to a
    count-aggregate + replicate plan, not a quadratic join; the five
    scalar counts pin both multiset sizes against their key-distinct
    shadow."""
    li = load_table(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    finished = li.filter(F.col("l_linestatus") == "F").select("l_orderkey")
    diff = returned.exceptAll(finished)
    isect = returned.intersectAll(finished)

    def one(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count("*").alias(name))

    out = one(returned, "n_returned")
    for frame in (
        one(finished, "n_finished"),
        one(diff, "n_except_all"),
        one(isect, "n_intersect_all"),
        one(diff.distinct(), "n_except_keys"),
    ):
        out = out.crossJoin(frame)
    return out


@query(
    "olap_yearly_growth",
    oracle="""
WITH yearly AS (
  SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS order_year,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 1000000 AS BIGINT)
           AS revenue_micros
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2)
SELECT n_name, order_year, revenue_micros,
       lag(revenue_micros) OVER (PARTITION BY n_name ORDER BY order_year)
         AS prev_year_micros,
       CAST(CASE WHEN lag(revenue_micros) OVER (PARTITION BY n_name
                                                ORDER BY order_year) > 0
            THEN (revenue_micros
                  - lag(revenue_micros) OVER (PARTITION BY n_name
                                              ORDER BY order_year)) * 10000
                 // lag(revenue_micros) OVER (PARTITION BY n_name
                                              ORDER BY order_year)
            ELSE NULL END AS BIGINT) AS growth_bps
FROM yearly
""",
)
def q_yearly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth: per nation, yearly revenue next to the
    prior year and the growth rate in integer basis points ((cur−prev)·
    10⁴ div prev — no float division in the gate).  The lag window runs
    over the AGGREGATE (≤ nations×years rows), never the fact table — the
    window-after-shrink ordering that keeps trend reports cheap at any
    scale."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    yearly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            (F.sum(_dec("o_totalprice")) * 1_000_000)
            .cast("bigint")
            .alias("revenue_micros")
        )
    )
    w = Window.partitionBy("n_name").orderBy("order_year")
    prev = F.lag("revenue_micros").over(w)
    return yearly.select(
        "n_name",
        "order_year",
        "revenue_micros",
        prev.alias("prev_year_micros"),
        F.when(
            prev > 0,
            F.expr(
                "cast((revenue_micros - lag(revenue_micros) over "
                "(partition by n_name order by order_year)) * 10000 div "
                "lag(revenue_micros) over (partition by n_name order by "
                "order_year) as bigint)"
            ),
        ).alias("growth_bps"),
    )


@query(
    "audit_table_stats",
    bench=True,
    oracle="""
SELECT * FROM (
  SELECT 'orders' AS table_name, COUNT(*) AS n_rows,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_key,
         CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT) AS n_null_probe,
         CAST(MIN(o_orderkey) AS BIGINT) AS key_min,
         CAST(MAX(o_orderkey) AS BIGINT) AS key_max
  FROM orders
  UNION ALL
  SELECT 'lineitem', COUNT(*),
         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT),
         CAST(COUNT(*) - COUNT(l_shipdate) AS BIGINT),
         CAST(MIN(l_orderkey) AS BIGINT), CAST(MAX(l_orderkey) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'customer', COUNT(*),
         CAST(COUNT(DISTINCT c_custkey) AS BIGINT),
         CAST(COUNT(*) - COUNT(c_acctbal) AS BIGINT),
         CAST(MIN(c_custkey) AS BIGINT), CAST(MAX(c_custkey) AS BIGINT)
  FROM customer
  UNION ALL
  SELECT 'events', COUNT(*),
         CAST(COUNT(DISTINCT event_id) AS BIGINT),
         CAST(COUNT(*) - COUNT(value) AS BIGINT),
         CAST(MIN(event_id) AS BIGINT), CAST(MAX(event_id) AS BIGINT)
  FROM events
  UNION ALL
  SELECT 'documents', COUNT(*),
         CAST(COUNT(DISTINCT doc_id) AS BIGINT),
         CAST(COUNT(*) - COUNT(text) AS BIGINT),
         CAST(MIN(doc_id) AS BIGINT), CAST(MAX(doc_id) AS BIGINT)
  FROM documents) s
""",
)
def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style statistics collection: per table, row count, key
    NDV, null count of a probe column, and the key min/max envelope — the
    stats a cost-based optimizer (and the Z-order/partition planners here)
    consume.  Each table is ONE full-width aggregate pass (count, distinct,
    nulls, extrema share a scan — not one scan per statistic); at 100 TB
    you run this per partition after ingest and merge, since every
    statistic here is mergeable (counts add, NDV via HLL, extrema by
    min/max)."""
    specs = [
        ("orders", "o_orderkey", "o_orderdate"),
        ("lineitem", "l_orderkey", "l_shipdate"),
        ("customer", "c_custkey", "c_acctbal"),
        ("events", "event_id", "value"),
        ("documents", "doc_id", "text"),
    ]
    out = None
    for table, key, probe in specs:
        t = load_table(spark, sf_dir, table)
        part = t.agg(
            F.count("*").alias("n_rows"),
            F.count_distinct(key).alias("n_distinct_key"),
            (F.count("*") - F.count(probe)).alias("n_null_probe"),
            F.min(key).cast("bigint").alias("key_min"),
            F.max(key).cast("bigint").alias("key_max"),
        ).select(
            F.lit(table).alias("table_name"),
            "n_rows",
            "n_distinct_key",
            "n_null_probe",
            "key_min",
            "key_max",
        )
        out = part if out is None else out.unionByName(part)
    return out
