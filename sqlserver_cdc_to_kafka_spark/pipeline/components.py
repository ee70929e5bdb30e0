"""Connected components over the near-duplicate candidate graph — the
clustering step that turns pairwise dedup hits into groups with one
canonical document each (the final stage of every dedup pipeline).

Two physical strategies, same contract:

1. ``connected_components`` — min-label propagation: label(v) := min(label
   of v and its neighbors), repeat to fixpoint. One join + one aggregation
   per round; rounds ≈ graph DIAMETER. Right default for near-dup graphs
   (shallow clusters, a handful of rounds).
2. ``connected_components_star`` — alternating large-star/small-star
   (Kiveris et al., "Connected Components in MapReduce and Beyond",
   SoCC'14): each round rewires every node toward its neighborhood
   minimum, converging in O(log n) rounds regardless of diameter — the
   scale path when components can be long chains (e.g. transitive
   near-dup runs at 100 TB, where diameter-many rounds would stall).

Both keep all data distributed; the driver loop only ever sees scalar
convergence checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """-> (doc_id, component) for every vertex in `edges`; component = the
    minimum vertex id reachable. Deterministic, engine-portable."""
    fwd = edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    # cache: every iteration joins against adj — without this, each round
    # re-executes the whole upstream candidate-generation DAG (for near-dup
    # inputs, the full LSH pipeline) instead of reading a materialized edge
    # list.  PARTITION-ALIGNED + MATERIALIZED (r15, the pagerank pattern —
    # guide §2.4): hash-repartitioned on src to the session's
    # shuffle-partition count and count()-materialized, so every round's
    # adj⋈labels join reads the cached partitioning instead of re-shuffling
    # the full edge list per round (an un-materialized cache under AQE is an
    # un-finalized AdaptiveSparkPlan whose partitioning reads as unknown, so
    # consumers plan defensive re-exchanges).  One alignment exchange at
    # materialization buys diameter-many full-edge exchanges; the count
    # tracks spark.sql.shuffle.partitions — scale-adaptive, not a local
    # constant.
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # repartition BEFORE distinct (r16, guide §2.4): hashpartitioning(src)
    # satisfies the distinct's ClusteredDistribution((src, dst)) — subset of
    # the keys — so the dedup aggregate runs ON the alignment exchange and
    # keeps its partitioning, where distinct-then-repartition paid TWO
    # full-edge exchanges to materialize the same cache.
    adj = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .repartition(n_part, "src")
        .distinct()
        .cache()
    )
    adj.count()
    labels = (
        adj.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
    ).cache()

    for _ in range(max_iterations):
        neighbor_min = (
            adj.join(labels, adj.src == labels.doc_id)
            .select(F.col("dst").alias("doc_id"), "component")
            .groupBy("doc_id")
            .agg(F.min("component").alias("nbr_min"))
        )
        # localCheckpoint (not cache): caching keeps re-execution away but
        # the LOGICAL plan still nests every previous round's — by round N
        # the AQE explain/task binaries grow geometrically and the driver
        # OOMs building plan strings (seen at sf0.1).  Same per-round
        # truncation the star variant uses; on a real cluster swap for
        # reliable checkpoint() if executor loss must be survivable.
        updated = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                (F.coalesce("nbr_min", F.col("component")) < F.col("component")).alias(
                    "__changed"
                ),
            )
        ).localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if n_changed == 0:
            break
    else:
        # The cap round itself may have made the LAST change (diameter ==
        # max_iterations exactly): one more no-change probe before raising
        # avoids that false positive (round-7 ADVICE).  Converged labels
        # are a fixpoint, so "no neighbor offers a smaller component" is
        # the full convergence condition.
        still_changing = (
            adj.join(labels, adj.src == labels.doc_id)
            .select(F.col("dst").alias("doc_id"), "component")
            .groupBy("doc_id")
            .agg(F.min("component").alias("nbr_min"))
            .join(labels, "doc_id")
            .filter(F.col("nbr_min") < F.col("component"))
            .count()
        )
        if still_changing:
            # never converged: labels are WRONG for any component whose
            # diameter exceeds max_iterations — failing loudly beats
            # silently returning partial propagation (long transitive
            # near-dup chains at 100 TB are exactly the case the star
            # variant exists for)
            raise RuntimeError(
                f"connected_components did not converge in {max_iterations} "
                "rounds (component diameter too large) — use "
                "connected_components_star, which needs O(log n) rounds"
            )
    return labels


def _sym(e: DataFrame) -> DataFrame:
    return e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v > u, m = min(Γ(u) ∪ {u}).

    r15 (guide §2.4, the count-window pattern): the neighborhood minimum is
    a MIN window over the u partition instead of a groupBy + join-back —
    the r14 form exchanged the symmetrized edge set three times per star
    (aggregate, join probe, distinct); the window form exchanges it twice
    (window, distinct) and drops the join outright.  Exact integer min in
    any combine order → identical edge set."""
    w_u = Window.partitionBy("u")
    return (
        _sym(e)
        .withColumn("m", F.least(F.min("v").over(w_u), F.col("u")))
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """(v, m) for every strictly-smaller neighbor v plus u itself, m =
    min of u's smaller neighborhood; drops the (m, m) self-edge.

    Same r15 window form as ``_large_star``; the one-per-u (u, m) row the
    r14 union branch contributed is emitted per edge row instead (a 2-way
    explode) and collapsed by the final distinct — the same set."""
    w_u = Window.partitionBy("u")
    cand = (
        _sym(e)
        .filter(F.col("v") < F.col("u"))
        .withColumn("m", F.min("v").over(w_u))
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("v").alias("node"), F.col("m").alias("m")),
                    F.struct(F.col("u").alias("node"), F.col("m").alias("m")),
                )
            ).alias("nm")
        )
        .select("nm.node", "nm.m")
    )
    return (
        cand.filter(F.col("node") != F.col("m"))
        .select(F.col("node").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 30,
) -> DataFrame:
    """Large-star/small-star connected components — same (doc_id, component)
    contract as ``connected_components``, O(log n) rounds instead of
    O(diameter). Convergence = the edge set reaches a fixpoint (stars
    centered on each component's min), detected by a count + order-free
    hash-sum pair — two scalar jobs per round, nothing collected."""
    verts = (
        _sym(
            edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        )
        .select(F.col("u").alias("doc_id"))
        .distinct()
        .cache()
    )
    e = (
        edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .cache()
    )
    sig_prev: tuple | None = None
    for _ in range(max_iterations):
        # localCheckpoint (not cache): each round's plan would otherwise
        # nest the previous round's — lineage and task binaries grow
        # geometrically over the loop
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        row = new_e.agg(
            F.count("*").alias("n"),
            # decimal accumulator: ANSI mode faults a BIGINT SUM overflow,
            # and hash sums overflow by design
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        e.unpersist()
        e = new_e
        if sig == sig_prev:
            break
        sig_prev = sig
    # fixpoint edges are (node → component-min) stars; centers re-attach as
    # their own component via the left join
    parents = e.groupBy("u").agg(F.min("v").alias("component"))
    return verts.join(
        parents.withColumnRenamed("u", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
    )
