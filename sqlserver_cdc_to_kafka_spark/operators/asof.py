"""As-of join — point-in-time lookup over a versioned (CDC) table.

Spark has no native ASOF JOIN (the brief's canonical example of an operator
the engine must compose itself). The scalable construction is the
union-and-carry pattern:

1. tag right (version) rows 0 and left (probe) rows 1, union on
   (key, time, tag);
2. one window per key ordered by (time, tag):
   ``last(right_payload, ignorenulls=True)`` carries the latest version at
   or before each probe row — ties resolve to the version row because tag 0
   sorts first;
3. keep the probe rows.

ONE shuffle + in-partition sort — the same cost as a regular sort-merge
join, no range explosion, no per-row subquery. Skewed keys fall to AQE or
salting like any other keyed shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_payload: Sequence[str],
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_time <= left_time`` for the same key (``how='left'`` keeps
    unmatched probe rows with nulls; 'inner' drops them).

    ``direction='forward'`` flips the lookup: the EARLIEST right row with
    ``right_time >= left_time`` (next-event semantics) — the same
    union-and-carry pass traversed in descending time, identical cost.
    Rows tied on time resolve to the version row in both directions
    (tag 0 sorts first either way); pre-reduce the right side if several
    versions can share one timestamp."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = [c for c in left.columns if c not in on]
    # the version payload rides as ONE struct: the struct is non-null for
    # every version row even when its fields are null (e.g. a delete event),
    # so last(..., ignorenulls) carries the latest ROW, not the latest
    # non-null field values
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    payload_type = right.select(payload_struct.alias("s")).schema["s"].dataType
    l_tagged = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(payload_type).alias("__r"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        payload_struct.alias("__r"),
    )
    unioned = r_tagged.unionByName(l_tagged)
    t_order = F.col("__t") if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(t_order, "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *on,
        "__t",
        "__tag",
        *lcols,
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    out = carried.filter(F.col("__tag") == 1).drop("__tag")
    if how == "inner":
        out = out.filter(F.col("__r").isNotNull())
    return out.select(
        *on,
        "__t",
        *lcols,
        *[F.col(f"__r.{c}").alias(c) for c in right_payload],
    )
