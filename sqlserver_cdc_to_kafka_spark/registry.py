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


def load_all() -> dict[str, Query]:
    """Import all query modules (side-effect registration) and return the
    registry."""
    from sqlserver_cdc_to_kafka_spark import queries as _q  # noqa: F401

    return dict(_REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in load_all().items() if q.bench}
