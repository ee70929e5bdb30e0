"""Graph analytics: fixed-point PageRank over the customer↔supplier
purchase graph.

Complements pipeline/components.py (connected components = the other graph
primitive): components prove O(log n)-round convergence machinery; PageRank
proves FIXED-ITERATION mass propagation — the join+aggregate-per-iteration
shape (importance scoring, influence ranking over trade/interaction
graphs).

Engine-exactness trick: the walk runs in INTEGER mass units (10^12 per
node), with per-edge contribution pr÷outdeg and damping 85/100 both as
integer division.  Float PageRank can't pass a hash gate — Σ(pr/outdeg)
over incoming edges is summation-order-dependent and every engine orders
differently — but integer mass sums are exact in any order.  Precision
loss vs float is ≤ outdeg units per node per iteration (≈1e-12 relative),
far below ranking resolution."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlserver_cdc_to_kafka_spark.registry import query
from sqlserver_cdc_to_kafka_spark.tables import load_table

_MASS = 10**12  # initial integer mass per node
_D_NUM, _D_DEN = 85, 100  # damping 0.85 as a ratio
_ITERS = 2


def _pagerank_oracle() -> str:
    """Unrolled-iteration SQL mirroring the Spark loop exactly (the loop is
    a STATIC unroll on both sides — no driver collect between rounds)."""
    base = f"(SELECT node, {_MASS} AS pr FROM nodes)"
    prev = base
    for i in range(_ITERS):
        prev = f"""(
  SELECT n.node,
         {_MASS} * {_D_DEN - _D_NUM} // {_D_DEN}
         + {_D_NUM} * COALESCE(m.inmass, 0) // {_D_DEN} AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(p.pr // d.outdeg) AS inmass
    FROM edges e
    JOIN {prev} p ON e.src = p.node
    JOIN deg d ON e.src = d.node
    GROUP BY e.dst) m ON n.node = m.node)"""
    return f"""
WITH edges_raw AS (
  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS c_node,
         's' || CAST(l_suppkey AS VARCHAR) AS s_node
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2),
edges AS (
  SELECT c_node AS src, s_node AS dst FROM edges_raw
  UNION ALL
  SELECT s_node, c_node FROM edges_raw),
nodes AS (SELECT DISTINCT src AS node FROM edges),
deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY 1)
-- CAST: DuckDB integer arithmetic widens to HUGEINT; Spark stays BIGINT
SELECT node, CAST(pr AS BIGINT) AS pr_mass FROM {prev} p
"""


@query("graph_pagerank_bipartite", bench=True, oracle=_pagerank_oracle())
def q_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-iteration damped PageRank over the bipartite who-buys-from-whom
    graph (customer↔supplier, undirected = both directed edges; an edge
    per distinct trading pair).

    Per iteration: one equi-join of the rank vector against the edge list
    (both shuffled on src — co-partitioned, so iteration 2 reuses the
    exchange) and one aggregate on dst.  The edge list and degree table
    are computed once and cached; iterations unroll into a single lazy
    plan with NO driver-side collect between rounds (contrast
    pipeline_kmeans_centroids, where the k×dim centroid collect per round
    is inherent).  At 100 TB scale the iteration cost is exactly one
    co-partitioned shuffle join per round — the same shape GraphX/Pregel
    lowers to."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # Node ids stay BIGINT through the hot path (custkey*2 / suppkey*2+1 —
    # collision-free parity tag) and render to the oracle's 'c…'/'s…'
    # strings only at the output boundary: the edge list is the query's
    # dominant shuffle/persist payload, and an UnsafeRow string node costs
    # ~3x the bytes of a long (sf100 measured: the string form needed
    # ~100 GB scratch for the 1B-row edge persist + 2 iteration shuffles
    # and died on local disk; the long form is the same plan at a third
    # the bytes). Same groups, same integer masses, same output strings.
    # PRECONDITION: source keys must be NONNEGATIVE — the decode below uses
    # `% 2` and `div 2`, which truncate toward zero, so a negative odd
    # encoding (-5 % 2 = -1, -5 div 2 = -2) would mislabel and mis-decode.
    # TPC-H keys are 1-based; a signed-key source needs pmod/floor-div here.
    pairs = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        (F.col("o_custkey") * 2).alias("c_node"),
        (F.col("l_suppkey") * 2 + 1).alias("s_node"),
    )
    # Caller-managed cache (the documented lazy-return persist pattern, same
    # as cdc.py / similarity.py): the function returns a LAZY plan whose
    # every iteration reads `edges`, so an in-function try/finally unpersist
    # fires BEFORE any job runs and the cache never exists during execution
    # (measured: getPersistentRDDs is empty when the action starts — the r10
    # audit mislabeled this site as a working release). Without the live
    # cache each of the 2 iterations plus the degree pass recomputes the
    # join+distinct edge derivation, tripling the dominant subtree's memory
    # pressure (the flaky 8 g heap death at sf10). Release is the session
    # LRU / the bench harness's clearCache between reps.
    #
    # The cache is PARTITION-ALIGNED (r15): hash-repartitioned on src to the
    # session's shuffle-partition count BEFORE persisting, so every
    # consumer keyed by src/node — the degree aggregate and BOTH iteration
    # joins — reads the cached partitioning instead of re-shuffling the
    # full edge list per round. One extra exchange at materialization buys
    # the removal of one full-edge exchange per iteration plus the degree
    # exchange (guide §2.4 "two operations keyed the same way share one
    # exchange"); the repartition count tracks spark.sql.shuffle.partitions,
    # so the alignment is scale-adaptive, not a local[32] constant.
    # r16 (guide §2.4): the pair dedup moved from a standalone
    # distinct-before-union (its own full exchange on (c, s)) to a distinct
    # ON the alignment exchange — hashpartitioning(src) satisfies the
    # dedup's ClusteredDistribution((src, dst)) (subset of the keys), so the
    # aggregate adds NO exchange and the cache keeps hash(src). Same edge
    # set: symmetrize-then-dedup ≡ dedup-then-symmetrize (the two directions
    # are distinct rows either way). One full-pair exchange removed from the
    # materialization job.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges = (
        pairs.select(F.col("c_node").alias("src"), F.col("s_node").alias("dst"))
        .unionByName(
            pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"))
        )
        .repartition(n_part, "src")
        .distinct()
        .persist()
    )
    # MATERIALIZE the cache before building the consumers: an unmaterialized
    # cache under AQE wraps its plan in an un-finalized AdaptiveSparkPlan
    # whose output partitioning reads as unknown, so every consumer plans a
    # defensive re-exchange and the repartition above buys nothing (measured:
    # the deg aggregate and both iteration joins each kept a full-edge
    # Exchange). After the count the InMemoryRelation exposes
    # hashpartitioning(src, n_part) and the downstream joins/aggregates plan
    # exchange-free. The count is bounded driver state (one long) — the same
    # in-function action pattern as cdc.py's frontier collect.
    #
    # r16 note (VERDICT task 7, examined and left): merging this count into
    # deg.count() (one materialization job for both caches) was considered
    # and REJECTED — deg's first action would then be planned while the
    # edges cache is still an unfinalized AdaptiveSparkPlan, so the deg
    # aggregate plans a defensive full-edge Exchange INSIDE the
    # materialization job. One saved driver round is not worth re-shuffling
    # the edge list (the query's dominant payload) once per run at scale.
    edges.count()
    # deg doubles as the node base (every node appears as a src of the
    # undirected edge list), and the rank vector CARRIES outdeg — one
    # join per iteration against edges instead of separate pr/deg/nodes
    # joins (3→2 per round, measured on the sf0.1 bench). Persisted (r15):
    # deg feeds the init vector plus one left join per iteration; uncached,
    # each consumer re-aggregated the full cached edge list (3 node-count
    # aggregates over |E| rows in the 2-iteration plan). Planned after the
    # edges materialization, the aggregate itself is exchange-free and deg
    # inherits the hash(node = src) partitioning both iteration left-joins
    # need; materialized for the same plan-time-visibility reason as edges.
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("outdeg"))
        .persist()
    )
    deg.count()
    pr = deg.withColumn("pr", F.lit(_MASS).cast("bigint"))
    for _ in range(_ITERS):
        contrib = (
            edges.join(pr, edges.src == pr.node)
            .groupBy(F.col("dst").alias("node"))
            # true integer division (`div`), not a double-division cast:
            # at outdeg > ~5e5 the float quotient can round across an
            # integer boundary and diverge from the oracle's `//`
            .agg(F.sum(F.expr("pr div outdeg")).alias("inmass"))
        )
        pr = deg.join(contrib, "node", "left").select(
            "node",
            "outdeg",
            (
                F.lit(_MASS * (_D_DEN - _D_NUM) // _D_DEN)
                + F.expr(
                    f"({_D_NUM} * coalesce(inmass, cast(0 as bigint))) div {_D_DEN}"
                )
            ).alias("pr"),
        )
    return pr.select(
        F.concat(
            F.when(F.col("node") % 2 == 0, F.lit("c")).otherwise(F.lit("s")),
            F.expr("node div 2").cast("string"),
        ).alias("node"),
        F.col("pr").alias("pr_mass"),
    )
