"""Connected components over the near-duplicate candidate graph — the
clustering step that turns pairwise dedup hits into groups with one
canonical document each (the final stage of every dedup pipeline).

Iterative min-label propagation:
  label(v) := min(label(v), min over neighbors' labels), repeat to fixpoint.
Each iteration is one join + one aggregation; iterations ≈ graph diameter
(near-dup graphs are shallow — a handful of rounds). The driver loop only
checks a scalar convergence count per round; all data stays distributed.
At larger diameters swap in large-star/small-star (same join primitives,
fewer rounds) — the shape of the loop is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    # list
    adj = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .cache()
    )
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
        ).cache()
        n_changed = updated.filter(F.col("__changed")).count()
        new_labels = updated.drop("__changed").cache()
        labels.unpersist()
        updated.unpersist()
        labels = new_labels
        if n_changed == 0:
            break
    return labels
