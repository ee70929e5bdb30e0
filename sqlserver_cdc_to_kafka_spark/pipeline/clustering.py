"""Iterative clustering over embedding columns (beyond-reference scope):
deterministic Lloyd's k-means expressed as repeated DataFrame passes.

Scale design: the centroid matrix is k·dim doubles — bounded driver state,
collected once per iteration exactly as MLlib's KMeans driver loop does
(unbounded alternative rejected: leaving centroids as a DataFrame plan makes
iteration i embed iteration i-1's whole subtree — lineage and recompute grow
per round). Each iteration is:

1. assignment — broadcast the k-row centroid relation against the corpus
   and take the (dist, cid)-minimal centroid per vector with a ``min_by``
   hash aggregate (map-side partials; cheaper than a row_number window,
   which would sort). Inlining the centroids as a literal array expression
   was tried and REJECTED: k·dim literals inside a nested fold made
   Catalyst analysis + codegen the dominant cost (same pathology as the
   create_map literal note in operators/merge.py) — a broadcast relation
   keeps the expression tree small.
2. update — posexplode to (cluster, dim_pos, val) and average per
   (cluster, pos): one shuffle, k·dim groups, map-side partials.

The input is cached across iterations (again the MLlib pattern).

Determinism contract (for oracle parity): init = the k lowest-id vectors;
all arithmetic in DOUBLE (float32 inputs upcast BEFORE subtraction), summed
in element order; ties in the argmin break toward the lower cluster id
(min_by ordering key = (dist, cid), unique because cid is unique).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_l2(vec_col: str, cent_col: str):
    """Squared L2 in DOUBLE; upcasting each float32 element before the
    subtraction keeps the arithmetic bit-identical to engines that compute
    on doubles (the oracle)."""
    return F.expr(
        f"aggregate(zip_with({vec_col}, {cent_col}, "
        f"(a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def assign_clusters(
    df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Assignment pass: nearest centroid per vector. The centroid side is
    k rows — broadcast, so the join is a map-side nested loop; the argmin
    is a min_by hash aggregate keyed by the vector id."""
    joined = df.select(id_col, vec_col).crossJoin(
        F.broadcast(centroids.select("cid", "centroid"))
    )
    best = (
        joined.withColumn("dist", _sq_l2(vec_col, "centroid"))
        .groupBy(id_col)
        .agg(
            F.min_by(
                F.struct(F.col("cid"), F.col("dist")),
                F.struct(F.col("dist"), F.col("cid")),
            ).alias("b")
        )
    )
    return best.select(id_col, F.col("b.cid").alias("cid"), F.col("b.dist").alias("dist"))


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic Lloyd's: init from the k lowest-id vectors, run
    ``iters`` assignment+update rounds. Returns (final_assignment,
    final_centroids); the final assignment is computed against the LAST
    updated centroids so callers see a consistent (centroid, membership)
    pair."""
    spark = df.sparkSession
    # persisted for the iteration's repeated passes; intentionally NOT
    # unpersisted here — the returned assignment DataFrame still reads
    # through it lazily, so reclamation is Spark's LRU storage eviction
    # (documented reliance; long sessions can clearCache() between queries)
    df = df.persist()

    def materialize(cent_df: DataFrame) -> DataFrame:
        rows = cent_df.collect()  # k rows — bounded driver state
        return spark.createDataFrame(
            sorted((r["cid"], list(r["centroid"])) for r in rows),
            "cid int, centroid array<double>",
        )

    centroids = materialize(
        df.orderBy(id_col)
        .limit(k)
        .select(
            F.col(id_col).cast("int").alias("cid"),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("centroid"),
        )
    )
    for _ in range(iters):
        # assignment that CARRIES the vector through the min_by, so the
        # update explodes straight off the agg output — no second join
        # (and no second corpus shuffle) per iteration
        joined = df.select(id_col, vec_col).crossJoin(
            F.broadcast(centroids.select("cid", "centroid"))
        )
        assigned = (
            joined.withColumn("dist", _sq_l2(vec_col, "centroid"))
            .groupBy(id_col)
            .agg(
                F.min_by(
                    F.struct(F.col("cid"), F.col(vec_col)),
                    F.struct(F.col("dist"), F.col("cid")),
                ).alias("b")
            )
        )
        means = (
            assigned.select(
                F.col("b.cid").alias("cid"),
                F.posexplode(f"b.{vec_col}").alias("pos", "val"),
            )
            .groupBy("cid", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
        )
        centroids = materialize(
            means.groupBy("cid").agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
                ).alias("centroid")
            )
        )
    return assign_clusters(df, centroids, id_col, vec_col), centroids
