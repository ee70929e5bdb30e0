"""Banded range join — point-in-interval matching at scale.

Spark compiles ``t BETWEEN lo AND hi`` joins without an equi-key into
BroadcastNestedLoop/cartesian plans, which die at volume. The standard
remedy (the shape behind Databricks' range-join hints) is BANDING:

1. pick a band width ≥ the typical interval length;
2. explode each interval into the bands it overlaps (intervals are short →
   few bands each);
3. equi-join points to bands on (key…, band), then apply the exact
   containment predicate.

The join becomes a plain hash join on (key, band); each point meets only
the handful of intervals sharing its band, not the whole interval set."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    band_width: int,
    open_ended_hi: bool = True,
) -> DataFrame:
    """Rows of ``points ⋈ intervals`` where ``lo <= point < hi`` (or
    ``<= hi`` with ``open_ended_hi=False``), equi-keyed by ``on`` + band.

    CLOSED intervals band from ``lo`` to their own ``hi`` — short intervals
    touch few bands regardless of corpus time span. OPEN intervals (NULL
    ``hi``, the "current version" tail — at most a handful per key) carry a
    NULL band instead of exploding; each point probes with two rows (its
    band and NULL) through ONE null-safe equi-join on (key…, band). This
    keeps band counts bounded by interval length — no global max-point
    aggregate, no per-open-interval explosion that grows with data age —
    and, unlike a closed/open filter split into two joins, evaluates each
    input subtree ONCE: the split form recomputed the interval source (and
    any window behind it, e.g. asof's lead) per branch — measured as a
    doubled scan + doubled window shuffle in the version-interval query."""
    lo_band = (F.col(lo_col) / band_width).cast("bigint")
    hi_band = (F.col(hi_col) / band_width).cast("bigint")
    null_band = F.array(F.lit(None).cast("bigint"))
    iv = intervals.withColumn(
        "__band",
        F.explode(
            F.when(F.col(hi_col).isNull(), null_band).otherwise(
                F.sequence(lo_band, F.greatest(hi_band, lo_band))
            )
        ),
    )
    pts = points.withColumn(
        "__band",
        F.explode(
            F.array(
                (F.col(point_col) / band_width).cast("bigint"),
                F.lit(None).cast("bigint"),
            )
        ),
    )
    upper = (
        F.col(point_col) < F.col(hi_col)
        if open_ended_hi
        else F.col(point_col) <= F.col(hi_col)
    )
    return (
        pts.join(
            iv,
            [*(pts[c] == iv[c] for c in on), pts["__band"].eqNullSafe(iv["__band"])],
        )
        .drop(iv["__band"])
        .drop(*[iv[c] for c in on])
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(hi_col).isNull() | upper)
        )
        .drop("__band")
    )


def asof_join_banded(
    points: DataFrame,
    versions: DataFrame,
    on: Sequence[str],
    point_col: str,
    time_col: str,
    band_width: int,
) -> DataFrame:
    """As-of join, SECOND physical strategy (the first is the union-and-
    carry ``operators/asof.asof_join``): each point row matched to the
    LATEST version row of its key with ``version_time <= point``.

    Versions become validity intervals ``[t, next_t)`` via ``lead`` over
    (key, time) — a per-key window, which parallelizes across keys — then
    the banded range join matches points to the one containing interval as
    an equi-join on (key…, band). Inner semantics: points before their
    key's first version drop out. Prefer this over union-and-carry when the
    version side is far smaller than the probe side (intervals build once,
    probes never co-shuffle with versions under AQE broadcast); pick
    ``band_width`` near the typical version spacing — each key's open final
    interval bypasses banding via the key-only equi-join path, so width only
    trades candidate count against band count of the CLOSED intervals."""
    from pyspark.sql import Window

    w = Window.partitionBy(*on).orderBy(time_col)
    iv = versions.withColumn("__asof_hi", F.lead(time_col).over(w))
    return banded_range_join(
        points, iv, on, point_col, time_col, "__asof_hi", band_width
    ).drop("__asof_hi")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    band_width: int,
    on: Sequence[str] = (),
) -> DataFrame:
    """Interval×interval OVERLAP join (half-open: ``l_lo < r_hi AND
    r_lo < l_hi``), banded like the point form so it never degenerates to
    a nested-loop.  Both sides explode into the bands they cover and
    equi-join on (key…, band); a pair sharing several bands would match
    once per shared band, so the join keeps only the FIRST shared band —
    ``band == greatest(l_lo_band, r_lo_band)`` — making each overlapping
    pair match exactly once with NO downstream distinct (the dedup that
    usually makes banded interval joins quadratic-ish in band count).
    Closed intervals only: band count per row is bounded by interval
    length / band_width."""
    lband = left.withColumn(
        "__lband",
        F.explode(
            F.sequence(
                (F.col(l_lo) / band_width).cast("bigint"),
                F.greatest(
                    (F.col(l_hi) / band_width).cast("bigint"),
                    (F.col(l_lo) / band_width).cast("bigint"),
                ),
            )
        ),
    ).withColumn("__l_lo_band", (F.col(l_lo) / band_width).cast("bigint"))
    rband = right.withColumn(
        "__rband",
        F.explode(
            F.sequence(
                (F.col(r_lo) / band_width).cast("bigint"),
                F.greatest(
                    (F.col(r_hi) / band_width).cast("bigint"),
                    (F.col(r_lo) / band_width).cast("bigint"),
                ),
            )
        ),
    ).withColumn("__r_lo_band", (F.col(r_lo) / band_width).cast("bigint"))
    cond = lband["__lband"] == rband["__rband"]
    for k in on:
        cond = cond & (lband[k] == rband[k])
    out = (
        lband.join(rband, cond)
        .filter(
            (F.col("__lband") == F.greatest("__l_lo_band", "__r_lo_band"))
            & (F.col(l_lo) < F.col(r_hi))
            & (F.col(r_lo) < F.col(l_hi))
        )
        .drop("__lband", "__rband", "__l_lo_band", "__r_lo_band")
    )
    if on:
        for k in on:
            out = out.drop(rband[k])
    return out
