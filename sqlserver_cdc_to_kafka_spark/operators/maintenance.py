"""Table-maintenance planning: small-file compaction grouping.

The reference's sink writes per-micro-batch files; any long-running CDC
table accretes small files until scans are listing-bound.  The planner
groups files into target-size compaction jobs with a DISTRIBUTED
prefix-sum bin-pack: within each partition directory, files order
deterministically, a running-bytes window assigns group =
floor(cum_bytes / target) — contiguous, near-target groups with one
window pass, no driver-side loop over the listing (at 100 TB the listing
itself is millions of rows).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def plan_compaction(
    files: DataFrame,
    partition_cols: Sequence[str],
    size_col: str,
    file_col: str,
    target_bytes: int,
) -> DataFrame:
    """files(partition…, file, bytes) -> plan rows with ``compact_group``
    per partition.  Groups are contiguous in (size desc, file) order —
    big files lead so they land alone in their group rather than
    straddling two — and every group's total is < target + max_file_size
    (the prefix-sum bound).  Deterministic: same listing → same plan."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col(size_col).desc(), F.col(file_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return files.withColumn(
        "compact_group", (prior / target_bytes).cast("bigint")
    )
