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
    max_point: int | None = None,
    open_ended_hi: bool = True,
) -> DataFrame:
    """Rows of ``points ⋈ intervals`` where ``lo <= point < hi`` (or
    ``<= hi`` with ``open_ended_hi=False``), equi-keyed by ``on`` + band.
    A NULL ``hi`` means unbounded (current interval); band generation caps
    at the probe side's max point so an open interval explodes to finitely
    many bands without losing matches. By default that cap is folded into
    the plan as a broadcast 1-row aggregate of ``points`` — no driver-side
    scalar pre-pass, one job. Pass ``max_point`` only when the caller
    already holds the bound."""
    if max_point is not None:
        banded_src = intervals.withColumn("__max_p", F.lit(max_point))
    else:
        mp = points.agg(F.max(point_col).alias("__max_p"))
        banded_src = intervals.crossJoin(F.broadcast(mp))
    hi_filled = F.coalesce(F.col(hi_col), F.lit(2**62))
    # empty probe side => NULL cap; fall back to lo so each open interval
    # keeps exactly one band instead of exploding to 2^62 / band_width
    band_cap = F.least(hi_filled, F.coalesce(F.col("__max_p"), F.col(lo_col)))
    banded = banded_src.withColumn(
        "__band",
        F.explode(
            F.sequence(
                (F.col(lo_col) / band_width).cast("bigint"),
                F.greatest(
                    (band_cap / band_width).cast("bigint"),
                    (F.col(lo_col) / band_width).cast("bigint"),
                ),
            )
        ),
    ).drop("__max_p")
    pts = points.withColumn("__band", (F.col(point_col) / band_width).cast("bigint"))
    joined = pts.join(banded, [*on, "__band"])
    upper = (
        F.col(point_col) < hi_filled
        if open_ended_hi
        else F.col(point_col) <= hi_filled
    )
    return joined.filter((F.col(point_col) >= F.col(lo_col)) & upper).drop("__band")


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
    ``band_width`` near the typical version spacing — open final intervals
    cap at the probe-side max, so width only trades candidate count against
    band explosion of the open tail."""
    from pyspark.sql import Window

    w = Window.partitionBy(*on).orderBy(time_col)
    iv = versions.withColumn("__asof_hi", F.lead(time_col).over(w))
    return banded_range_join(
        points, iv, on, point_col, time_col, "__asof_hi", band_width
    ).drop("__asof_hi")
