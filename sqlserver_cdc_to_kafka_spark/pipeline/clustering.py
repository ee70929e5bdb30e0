"""Iterative clustering over embedding columns (beyond-reference scope):
deterministic Lloyd's k-means expressed as repeated DataFrame aggregations.

Scale design: each iteration is (1) an assignment pass — broadcast the k
centroids (k·dim doubles, always tiny) against the full corpus, argmin by
squared L2 — and (2) an update pass — posexplode to (cluster, dim_pos, val)
and average per (cluster, pos): one shuffle keyed by (cluster, pos), k·dim
groups, map-side partials. Driver state is exactly the k×dim centroid
matrix (bounded, collect()ed once per iteration — same pattern as MLlib's
own KMeans driver loop). Nothing anywhere is per-row Python.

Determinism contract (for oracle parity): init = the k lowest-id vectors;
all arithmetic in DOUBLE (float32 inputs upcast BEFORE subtraction);
ties in the argmin break toward the lower cluster id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sq_l2(vec_col: str, cent_col: str):
    """Squared L2 in DOUBLE; upcasting each float32 element before the
    subtraction keeps the arithmetic bit-identical to engines that compute
    on doubles (the oracle)."""
    return F.expr(
        f"aggregate(zip_with({vec_col}, {cent_col}, "
        f"(a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE)) "
        f"* (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def assign_clusters(
    df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Assignment pass: nearest centroid per vector. The centroid side is
    k rows — broadcast by hint, so this is a map-side nested-loop over a
    tiny build side, never a shuffle of the corpus."""
    joined = df.select(id_col, vec_col).crossJoin(
        F.broadcast(centroids.select("cid", "centroid"))
    )
    w = Window.partitionBy(id_col).orderBy("dist", "cid")
    return (
        joined.withColumn("dist", _sq_l2(vec_col, "centroid"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "cid", "dist")
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic Lloyd's: init from the k lowest-id vectors, run
    ``iters`` assignment+update rounds. Returns (final_assignment,
    final_centroids); final_assignment is computed against the LAST updated
    centroids so callers see a consistent (centroid, membership) pair."""
    centroids = (
        df.orderBy(id_col)
        .limit(k)
        .select(
            F.col(id_col).cast("int").alias("cid"),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("centroid"),
        )
    )
    for _ in range(iters):
        assigned = assign_clusters(df, centroids, id_col, vec_col)
        exploded = (
            df.join(assigned.select(id_col, "cid"), id_col)
            .select("cid", F.posexplode(vec_col).alias("pos", "val"))
        )
        means = exploded.groupBy("cid", "pos").agg(
            F.avg(F.col("val").cast("double")).alias("m")
        )
        centroids = (
            means.groupBy("cid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
                ).alias("centroid")
            )
        )
    return assign_clusters(df, centroids, id_col, vec_col), centroids
