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
