"""Registry of declared queries: the driver contract (__spark_entry__).

Every implemented operator from SURVEY.md §2 (plus the beyond-reference
pipeline ops) registers here as a named query ``(spark, sf_dir) -> DataFrame``
with, where SQL-expressible, a DuckDB oracle SQL string over the same parquet
views. Column names/aliases MUST match between the two — the driver sorts
columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, bench: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, bench)
        return fn

    return deco


# The driver's correctness gate checks the FIRST 50 registered queries per
# round.  load_all() orders the registry by driver-witness staleness derived
# from the CORRECTNESS_r*.json artifacts at the repo root (never-checked
# queries first, then oldest last-green round), so the rotation maintains
# itself: whatever the driver hasn't confirmed recently automatically lands
# inside the 50-slot window next round.
#
# _DRIVER_PRIORITY is now only an OPTIONAL manual pin-list — names placed
# here jump ahead of the staleness ranking (use it to force a same-round
# witness for a query whose semantics just changed).  Unknown names raise:
# a typo here must not silently drop a query out of the window.
#
# ROUND 13 (round-12 VERDICT task 2): both r12 pins are cleared —
# graph_pagerank_bipartite and pipeline_domain_mixture got their green
# driver witness in CORRECTNESS_r12 (rows/schema/hash all matched), so
# rotation resumes on the r7-aged tail.  No query function or oracle
# changed this round, so no new pin is needed.
_DRIVER_PRIORITY: list[str] = []


def _witness_ages() -> dict[str, tuple[int, int]]:
    """name -> (seen_flag, last_green_round) sort key components, read from
    CORRECTNESS_r*.json at the repo root.  Never-seen names are absent and
    default to (0, 0) so they sort first; among seen names a lower (older)
    last-green round sorts first.  Missing/invalid files degrade to
    registration order (empty dict)."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last_green: dict[str, int] = {}
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            seen.add(name)
            green = bool(
                row.get("rows_match")
                and row.get("schema_match", True)
                and (
                    row.get("hash_match")
                    if row.get("hash_match") is not None
                    else True
                )
                and not row.get("err")
            )
            if green:
                last_green[name] = max(last_green.get(name, 0), rnd)
    out: dict[str, tuple[int, int]] = {}
    for name in seen:
        out[name] = (1, last_green.get(name, 0))
    return out


def load_all() -> dict[str, Query]:
    """Import all query modules (side-effect registration) and return the
    registry, ordered stalest-driver-witness first so the driver's capped
    correctness window always covers the at-risk set (see _DRIVER_PRIORITY)."""
    from sqlserver_cdc_to_kafka_spark import queries as _q  # noqa: F401

    unknown = [n for n in _DRIVER_PRIORITY if n not in _REGISTRY]
    if unknown:
        raise ValueError(
            f"_DRIVER_PRIORITY names not in registry (typo or renamed query): {unknown}"
        )

    ages = _witness_ages()
    reg_pos = {name: i for i, name in enumerate(_REGISTRY)}
    pin_pos = {name: i for i, name in enumerate(_DRIVER_PRIORITY)}

    def sort_key(name: str):
        # pinned first (in pin order), then never-witnessed, then stalest
        # green, ties broken by registration order for determinism
        pinned = pin_pos.get(name, len(_DRIVER_PRIORITY))
        seen_flag, last_green = ages.get(name, (0, 0))  # unseen => never checked
        return (pinned, seen_flag, last_green, reg_pos[name])

    ordered: dict[str, Query] = {}
    for name in sorted(_REGISTRY, key=sort_key):
        ordered[name] = _REGISTRY[name]
    return ordered


def spark_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items() if q.bench}
