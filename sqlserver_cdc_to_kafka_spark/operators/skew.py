"""Skew-handling join (scale toolbox).

At 100 TB a shuffle join on a key with heavy hitters stalls on a few huge
partitions. Two standard remedies, both provided:

- **AQE skew join** (`spark.sql.adaptive.skewJoin.enabled`, on by default in
  the engine session) — runtime splitting of oversized partitions; zero code.
- **Salting** (this module) — for deterministic plans or engines without AQE:
  explode the SMALL side ``salt_factor`` ways, spray the big side uniformly,
  join on (key, salt). Same result set as the plain join, with the hot key's
  rows spread over ``salt_factor`` reducers.

The reference never needs this (its joins are tiny catalog/metadata joins),
but the LLM-pipeline operators (shingle index, embedding buckets) do.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side's hot keys
    spread across ``salt_factor`` sub-partitions.

    The big side gets a uniform pseudorandom salt derived from its row
    content (xxhash64 — cheap, deterministic, no rand() so retries/replays
    stay stable); the small side is replicated once per salt value via a
    literal explode. Join keys become (on..., salt); the salt column never
    escapes."""
    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_factor))
    ).cast("int")
    big_salted = big.withColumn("__salt", salt)
    small_salted = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    out = big_salted.join(small_salted, [*on, "__salt"], how)
    return out.drop("__salt")


def chunked_trailing_agg(
    df: DataFrame,
    part_col: str,
    order_cols: Sequence[str],
    val_col: str,
    n_prec: int,
    chunk_col: str,
) -> DataFrame:
    """Trailing ROWS-frame sum+count per key, with the hot key SPLIT.

    ``SUM/COUNT OVER (PARTITION BY key ORDER BY ... ROWS n_prec PRECEDING)``
    normally sorts every row of a key in ONE task — the r10 skew probe
    measured a 5.04x straggler on a key holding 29% of rows (4.4M records
    in the hot task vs a 165k median). A trailing frame only ever reaches
    ``n_prec`` rows back, so the stream is splittable exactly:

    1. bucket rows by ``chunk_col`` (e.g. a time bucket) — all heavy
       shuffles key on (key, bucket), which the hot key spreads across;
    2. carry, into each (key, bucket), the ``n_prec`` stream-LATEST rows
       from all EARLIER buckets. The candidate set is each bucket's own
       last-``n_prec`` tail: any row among the stream-last-``n_prec``
       before bucket k has at most ``n_prec - 1`` rows after it overall,
       hence at most that many after it in its own bucket — so it is in
       its bucket's tail. A sparse bucket therefore cannot hide
       predecessors (the naive carry-from-previous-bucket version missed
       exactly that; caught by the random-stream equality pin). The
       tail×bucket ranking relation is ~``n_prec``×buckets rows per key —
       bounded by the chunking resolution, not data volume, so skew-free;
    3. evaluate the frame inside (key, bucket) over own + carried rows and
       drop the carried rows from the output.

    PRECONDITION — ``chunk_col`` must be a MONOTONE NON-DECREASING function
    of the ``order_cols`` prefix within each key (e.g. a time bucket
    derived from the leading order column). The carry step sorts candidate
    rows purely by ``order_cols`` inside the target bucket; a bucketing
    that interleaves with the stream order (bucket 2 rows ordered before
    bucket 1 rows) silently corrupts every frame — rows from a "later"
    bucket would be stream-earlier yet never carried backwards. This is
    not checked row-by-row at scale (it would cost a full extra window
    pass); ``_assert_chunk_monotone`` below is the debug-path check and
    tests/test_chunked_trailing_agg.py pins a violation raising it.

    Bit-identical to the single-partition window (same rows in every
    frame, same order), pinned by tests/test_chunked_trailing_agg.py.
    Returns df's columns plus ``__sum`` (sum of val_col over the frame)
    and ``__cnt`` (frame row count)."""
    from pyspark.sql import Window

    oc = [F.col(c) for c in order_cols]
    ev = df.withColumn("__b", F.col(chunk_col))
    # (2a) last n_prec rows of each (key, bucket)
    w_tail = Window.partitionBy(part_col, "__b").orderBy(
        *[c.desc() for c in oc]
    )
    tails = (
        ev.withColumn("__rnd", F.row_number().over(w_tail))
        .filter(F.col("__rnd") <= n_prec)
        .drop("__rnd")
    )
    # (2b) for every present (key, bucket), the n_prec stream-latest rows
    # among ALL earlier buckets' tails (see docstring for why the tails
    # are a sufficient candidate set). Tiny relation: ~n_prec rows per
    # (key, bucket) joined to the key's bucket list.
    present = ev.select(part_col, "__b").distinct()
    cand = (
        tails.withColumnRenamed("__b", "__tb")
        .join(present, part_col)
        .filter(F.col("__tb") < F.col("__b"))
    )
    w_rank = Window.partitionBy(part_col, "__b").orderBy(
        *[c.desc() for c in oc]
    )
    carried = (
        cand.withColumn("__rk", F.row_number().over(w_rank))
        .filter(F.col("__rk") <= n_prec)
        .drop("__tb", "__rk")
        .withColumn("__carry", F.lit(True))
    )
    allr = ev.withColumn("__carry", F.lit(False)).unionByName(carried)
    w = (
        Window.partitionBy(part_col, "__b")
        .orderBy(*oc)
        .rowsBetween(-n_prec, Window.currentRow)
    )
    return (
        allr.withColumn("__sum", F.sum(val_col).over(w))
        .withColumn("__cnt", F.count("*").over(w))
        .filter(~F.col("__carry"))
        .drop("__b", "__carry")
    )


def _assert_chunk_monotone(
    df: DataFrame,
    part_col: str,
    order_cols: Sequence[str],
    chunk_col: str,
) -> None:
    """Debug-path check of chunked_trailing_agg's precondition: within each
    ``part_col`` key, ``chunk_col`` is non-decreasing along ``order_cols``.

    Deliberately NOT called on the scale path — it is itself a
    single-partition-per-key window (the exact shape the operator exists
    to avoid); use it in tests / one-off validation of a new bucketing.
    Raises ValueError with the violation count if the bucketing
    interleaves with the stream order."""
    from pyspark.sql import Window

    w = Window.partitionBy(part_col).orderBy(*[F.col(c) for c in order_cols])
    bad = (
        df.withColumn("__prev", F.lag(chunk_col).over(w))
        .filter(F.col("__prev") > F.col(chunk_col))
        .count()
    )
    if bad:
        raise ValueError(
            f"chunk_col {chunk_col!r} is not monotone non-decreasing in "
            f"{list(order_cols)} within {part_col!r}: {bad} inversions — "
            "chunked_trailing_agg would corrupt every frame touching them"
        )
