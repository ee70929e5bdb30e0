"""Distributed EXACT order statistics without per-group sorts.

The rank-window formulation of an exact percentile (row_number over a
group partition) funnels every group's rows through one task — fine when
groups are numerous and small, hostile when a handful of groups hold
billions of rows.  This operator computes the k-th smallest value per
group by DISTRIBUTED SELECTION instead:

  pass 1 — per-(group, bucket) counts over a value-range grid (one
           map-side-combined shuffle, output bounded by
           |groups| · n_buckets, independent of row count);
  pass 2 — for each group, the candidate bucket containing the target
           rank is identified from the (tiny) bucket histogram, and the
           residual rank is resolved by sorting ONLY that bucket's rows
           (expected |rows| / n_buckets of the group, one bounded
           TakeOrdered per group).

Driver state is the bucket histogram — bounded by |groups| · n_buckets
by construction, never by data size — the same bounded-scalar-collect
contract as the k-means centroid loop (pipeline/clustering.py).  The
operator therefore requires LOW-CARDINALITY groups (its intended use:
per-event-type / per-step latency percentiles); for high-cardinality
groups use the rank-window form, whose per-group rows are small.

Values must be integers (the engine's exact-percentile queries already
ride integer microseconds).  Rank semantics: ``k``-th smallest with
k = ceil-style ranks like (n+1)//2, matching the rank-window queries.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_group_kth(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rank_fns: dict[str, Callable[[int], int]],
    n_buckets: int = 1024,
) -> list[tuple]:
    """Return [(group, n, {label: value})] — for each group, the exact
    k-th smallest ``value_col`` for every rank function in ``rank_fns``
    (each maps the group row-count n -> target rank in [1, n]).

    r15 (guide §5 caching + §1.2): the operator makes THREE passes over
    its input — stats, bucket counts, residual resolution — and the r14
    form re-executed the caller's whole upstream DAG for each (the
    shipping-delay query re-ran its lineitem⋈orders join TWELVE times:
    2 full passes + one job per group×label).  Now the (g, v) projection
    is persisted for the operator's lifetime (released before return),
    and ALL residual ranks resolve in ONE pass: the |groups|·|labels|
    target-bucket table broadcasts, hash-joins on g with the bucket range
    as a residual condition, and a row_number window picks the
    residual-th smallest per (g, label).  Per-(g, label) window slice ≈
    n_g / n_buckets rows through one task — the same bound the per-target
    TakeOrdered had."""
    base = df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v")).persist()
    stats = {
        r["g"]: (r["lo"], r["hi"], r["n"])
        for r in base.groupBy("g")
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    # one bucket-count pass for ALL groups (not one job per group)
    width_expr = F.create_map(
        *[
            x
            for g, (lo, hi, _n) in stats.items()
            for x in (
                F.lit(g),
                F.lit(max(1, (int(hi) - int(lo)) // n_buckets + 1)),
            )
        ]
    )
    lo_expr = F.create_map(
        *[x for g, (lo, _hi, _n) in stats.items() for x in (F.lit(g), F.lit(int(lo)))]
    )
    counts = (
        base.withColumn("w", width_expr[F.col("g")])
        .withColumn("lo", lo_expr[F.col("g")])
        # integer floored division: double division here could round a value
        # near 2^53 into a neighbouring bucket, disagreeing with the integer
        # range filter in pass 2 and breaking the EXACT guarantee
        .select(
            "g",
            F.expr("(v - lo) div w").cast("bigint").alias("b"),
        )
        .groupBy("g", "b")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    hist: dict = {}
    for r in counts:
        hist.setdefault(r["g"], []).append((r["b"], r["c"]))
    targets: list[tuple] = []
    for g, (lo, hi, n) in stats.items():
        w = max(1, (int(hi) - int(lo)) // n_buckets + 1)
        buckets = sorted(hist[g])
        for label, rank_fn in rank_fns.items():
            k = rank_fn(int(n))
            cum = 0
            target_bucket, residual = None, None
            for b, c in buckets:
                if cum + c >= k:
                    target_bucket, residual = b, k - cum
                    break
                cum += c
            # residual-th smallest within the candidate bucket only
            blo = int(lo) + int(target_bucket) * w
            targets.append((g, label, blo, blo + w, int(residual)))
    kth: dict[tuple, int] = {}
    if targets:
        g_type = base.schema["g"].dataType.simpleString()
        tdf = df.sparkSession.createDataFrame(
            targets,
            f"tg {g_type}, label string, blo bigint, bhi bigint, residual bigint",
        )
        w_rank = Window.partitionBy("g", "label").orderBy("v")
        kth = {
            (r["g"], r["label"]): int(r["v"])
            for r in (
                base.join(
                    F.broadcast(tdf),
                    (F.col("g") == F.col("tg"))
                    & (F.col("v") >= F.col("blo"))
                    & (F.col("v") < F.col("bhi")),
                )
                .withColumn("rn", F.row_number().over(w_rank))
                .filter(F.col("rn") == F.col("residual"))
                .select("g", "label", "v")
                .collect()
            )
        }
    base.unpersist()
    return [
        (g, int(n), {label: kth[(g, label)] for label in rank_fns})
        for g, (_lo, _hi, n) in stats.items()
    ]


def exact_group_percentiles_df(
    df: DataFrame,
    group_col: str,
    value_col: str,
    labels: Sequence[tuple[str, Callable[[int], int]]],
    out_schema: str,
) -> DataFrame:
    """DataFrame wrapper: one output row per group with n and each
    labelled order statistic."""
    rank_fns = dict(labels)
    rows = exact_group_kth(df, group_col, value_col, rank_fns)
    data = [
        tuple([g, n] + [res[label] for label, _ in labels]) for g, n, res in rows
    ]
    return df.sparkSession.createDataFrame(data, out_schema)
