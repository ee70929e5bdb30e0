"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``sqlserver_cdc_to_kafka_spark`` — this file
is the thin contract shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
# Python WORKERS resolve cloudpickled module references through their own
# environment, not the driver's sys.path — export the repo root so pandas-UDF
# closures that name module-level helpers import cleanly from any cwd.
# Effective as long as this import happens before the JVM first launches
# (the driver loads this shim before running any query).
if _REPO_ROOT not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO_ROOT
        + (os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else "")
    )

FLAGSHIP = "cdc_replay_merge"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the replayer merge (SURVEY §3.3): last-op-per-key dedupe of the
    change feed, deletes-first anti-join, MERGE-style upsert onto the orders
    snapshot — the reference's core end-to-end capability in one query.
    """
    from sqlserver_cdc_to_kafka_spark.registry import spark_queries

    return spark_queries()[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from sqlserver_cdc_to_kafka_spark.registry import spark_queries

    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (same column
    aliases; queries without an entry get the driver's rows-only check)."""
    from sqlserver_cdc_to_kafka_spark.registry import oracle_sqls

    return oracle_sqls()
