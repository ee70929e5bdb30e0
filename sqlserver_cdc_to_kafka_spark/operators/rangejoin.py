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
    max_point: int,
    open_ended_hi: bool = True,
) -> DataFrame:
    """Rows of ``points ⋈ intervals`` where ``lo <= point < hi`` (or
    ``<= hi`` with ``open_ended_hi=False``), equi-keyed by ``on`` + band.
    A NULL ``hi`` means unbounded (current interval); band generation caps
    at ``max_point`` (the probe side's max — one tiny pre-aggregate) so an
    open interval explodes to finitely many bands without losing matches."""
    hi_filled = F.coalesce(F.col(hi_col), F.lit(2**62))
    band_cap = F.least(hi_filled, F.lit(max_point))
    banded = intervals.withColumn(
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
    )
    pts = points.withColumn("__band", (F.col(point_col) / band_width).cast("bigint"))
    joined = pts.join(banded, [*on, "__band"])
    upper = (
        F.col(point_col) < hi_filled
        if open_ended_hi
        else F.col(point_col) <= hi_filled
    )
    return joined.filter((F.col(point_col) >= F.col(lo_col)) & upper).drop("__band")
