"""Iterative clustering over embedding columns (beyond-reference scope):
deterministic Lloyd's k-means expressed as repeated DataFrame passes.

Scale design: the centroid matrix is k·dim doubles — bounded driver state,
collected once per iteration exactly as MLlib's KMeans driver loop does
(unbounded alternative rejected: leaving centroids as a DataFrame plan makes
iteration i embed iteration i-1's whole subtree — lineage and recompute grow
per round). Each iteration is:

1. assignment — a PURE PROJECTION: the k centroids ride along as ONE
   array<struct<cid, centroid>> row attached via a broadcast nested-loop
   cross join (1 row — no per-centroid row multiplication), and the argmin
   is ``array_min(transform(cents, …))`` — struct ordering (dist, cid) is
   exactly the old min_by tie-break. This removes the r14 shape's k×
   row blowup AND its corpus-wide groupBy(id) exchange, whose groups were
   already task-local (every id's k candidate rows came out of one task, so
   the exchange merged already-complete partials — pure shuffle waste,
   measured 2.56 s → ~1.3 s on the sf0.1 bench). Inlining the centroids as
   a LITERAL array was tried and REJECTED long before: k·dim literals inside
   a nested fold made Catalyst analysis + codegen the dominant cost (same
   pathology as the create_map literal note in operators/merge.py) — a
   broadcast relation keeps the expression tree small; making it a single
   1-row array keeps the join from multiplying rows.
2. update — posexplode the assignment projection to (cluster, dim_pos, val)
   and average per (cluster, pos): one shuffle whose map-side partials
   collapse to k·dim rows per task — the exchange carries k·dim·tasks rows,
   not the corpus.

The input is cached across iterations (again the MLlib pattern).

Determinism contract (for oracle parity): init = the k lowest-id vectors;
all arithmetic in DOUBLE (float32 inputs upcast BEFORE subtraction), summed
in element order; ties in the argmin break toward the lower cluster id
(struct ordering key = (dist, cid), unique because cid is unique).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _best_centroid(vec_col: str, cents_col: str = "cents") -> F.Column:
    """struct(dist, cid) of the nearest centroid, as one array expression
    over the broadcast centroid array. Squared L2 in DOUBLE; upcasting each
    float32 element before the subtraction keeps the arithmetic bit-identical
    to engines that compute on doubles (the oracle). ``array_min`` over
    struct(dist, cid) is lexicographic — the same (dist, cid) tie-break as
    the previous min_by form, so assignments are bit-identical."""
    return F.expr(
        f"array_min(transform({cents_col}, c -> struct("
        f"aggregate(zip_with({vec_col}, c.centroid, "
        f"(a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) AS dist, "
        f"c.cid AS cid)))"
    )


def _with_best(df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, b=struct(dist, cid)) — assignment as a map-only projection."""
    return (
        df.select(id_col, vec_col)
        .crossJoin(F.broadcast(centroids))
        .withColumn("b", _best_centroid(vec_col))
    )


def assign_clusters(
    df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Assignment pass: nearest centroid per vector. The centroid side is
    ONE row (array of k structs) — broadcast nested-loop attach, argmin as
    an array_min projection; no aggregate, no exchange."""
    best = _with_best(df, centroids, id_col, vec_col)
    return best.select(
        id_col, F.col("b.cid").alias("cid"), F.col("b.dist").alias("dist")
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
    final_centroids); the final assignment is computed against the LAST
    updated centroids so callers see a consistent (centroid, membership)
    pair. ``final_centroids`` is the 1-row array relation (cents =
    array<struct<cid, centroid>> sorted by cid)."""
    spark = df.sparkSession
    # persisted for the iteration's repeated passes; intentionally NOT
    # unpersisted here — the returned assignment DataFrame still reads
    # through it lazily, so reclamation is Spark's LRU storage eviction
    # (documented reliance; long sessions can clearCache() between queries)
    df = df.persist()

    def materialize(cent_df: DataFrame) -> DataFrame:
        rows = cent_df.collect()  # k rows — bounded driver state
        return spark.createDataFrame(
            [(sorted((r["cid"], list(r["centroid"])) for r in rows),)],
            "cents array<struct<cid: int, centroid: array<double>>>",
        )

    # Init centroids stay a LAZY 1-row plan (r16, driver-round reduction):
    # the k lowest-id vectors aggregate to the same sorted
    # array<struct<cid, centroid>> row in-plan (array_sort over the unique
    # cid is exactly materialize()'s python sort), and iteration 1 embeds it
    # as its broadcast side — one TakeOrdered subtree inside iteration 1's
    # job instead of a SEPARATE init collect round-trip. Only the init is
    # safe to leave lazy: it is one bounded subtree, whereas leaving the
    # UPDATED centroids lazy would nest iteration i-1's whole plan inside
    # iteration i (the documented rejection above). Iteration means are
    # identical — same init values, same arithmetic.
    centroids = (
        df.orderBy(id_col)
        .limit(k)
        .select(
            F.col(id_col).cast("int").alias("cid"),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("centroid"),
        )
        .agg(
            F.expr("array_sort(collect_list(struct(cid, centroid)))").alias("cents")
        )
    )
    for _ in range(iters):
        # assignment is a projection, so the update explodes straight off it
        # — the only exchange per iteration is the k·dim-group aggregate,
        # and map-side partials collapse it to k·dim rows per task
        means = (
            _with_best(df, centroids, id_col, vec_col)
            .select(
                F.col("b.cid").alias("cid"),
                F.posexplode(vec_col).alias("pos", "val"),
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
