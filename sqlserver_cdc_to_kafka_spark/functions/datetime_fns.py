"""Date/time scalar functions (SURVEY §2.8 F6/F9/F17).

Everything here is **session-timezone-independent** by construction: the
driver may run queries in any session tz, and the DuckDB oracle computes on
naive timestamps, so epochs are extracted with tz-free arithmetic:

- TIMESTAMP_NTZ (what Spark 4 infers for the test parquet): naive
  ``timestampdiff`` from the NTZ epoch literal — matches DuckDB ``epoch_us``.
- TIMESTAMP (instant): ``unix_micros`` — instant-based, tz-free.
- LONG (events.ts nanos surfaced by nanosAsLong): integer division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def epoch_micros(df: DataFrame, col: str) -> Column:
    """Epoch microseconds as BIGINT for any of the engine's time columns."""
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        return F.expr(f"{col} div 1000").alias(col)
    if isinstance(dt, T.TimestampNTZType):
        # NOT timestampdiff: Spark's TIMESTAMPDIFF round-trips NTZ operands
        # through session-local time, so a wall-clock that falls in the
        # session zone's DST spring-forward gap (e.g. 1999-04-04 02:00 under
        # America/New_York) silently shifts by +1 h. Field arithmetic reads
        # the NTZ fields directly — tz-invariant for every wall-clock,
        # including DST-gap, DST-overlap, and fractional seconds.
        return F.expr(
            f"unix_date(CAST({col} AS DATE)) * 86400000000"
            f" + CAST(hour({col}) AS BIGINT) * 3600000000"
            f" + CAST(minute({col}) AS BIGINT) * 60000000"
            f" + CAST(date_part('SECOND', {col}) * 1000000 AS BIGINT)"
        )
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(F.col(col))
    raise TypeError(f"{col}: unsupported time column type {dt}")


def int_div(num: Column, denom: Column | int) -> Column:
    """Exact integral division (Spark's ``div`` operator, LongType result).

    ``(a / b).cast("bigint")`` goes through an IEEE double: above 2^53 the
    quotient can round across an integer boundary before the cast truncates
    (the round-7 ADVICE failure class, first fixed in operators/selection.py).
    ``div`` divides JVM-side in integer arithmetic — exact for all bigint
    inputs.

    Sign semantics (round-8 ADVICE closure, resolved by measurement): the
    advice flagged a presumed trunc-vs-floor divergence from the DuckDB
    ``//`` oracle on negative numerators.  Measured on the shipped DuckDB
    (1.0.0): integer ``//`` ALSO truncates toward zero (``-7 // 3 = -2``,
    ``7 // -3 = -2``) — identical to ``div`` for every sign combination, so
    no precondition exists and no guard is needed.  Pinned by
    ``test_int_div_truncation_matches_duckdb_all_signs`` so a future DuckDB
    upgrade that switches ``//`` to floor semantics fails loudly.
    """
    if isinstance(denom, int):
        denom = F.lit(denom)
    return F.call_function("div", num, denom)


def as_event_time(df: DataFrame, col: str) -> Column:
    """A TimestampType *instant* rebuilt from any supported time column —
    the form ``F.window`` / ``F.session_window`` / watermarks need. Built
    from :func:`epoch_micros` so the same dtype dispatch (LONG nanos /
    TIMESTAMP_NTZ / TIMESTAMP) covers every testdata vintage; the result's
    ``unix_micros`` equals ``epoch_micros`` under any session timezone."""
    return F.timestamp_micros(epoch_micros(df, col))


def epoch_seconds(df: DataFrame, col: str) -> Column:
    """Epoch seconds as DOUBLE (fractional part preserved)."""
    return epoch_micros(df, col) / F.lit(1_000_000.0)


def clock_skew_adjust(col: Column, skew_seconds: float) -> Column:
    """F9 (``cdc_kafka/clock_sync.py:24-39``): shift a DB-clock timestamp by
    the measured driver-vs-DB skew. The skew is measured driver-side and
    applied as a constant interval per batch."""
    micros = int(round(skew_seconds * 1_000_000))
    return col + F.make_interval(secs=F.lit(micros) / F.lit(1_000_000.0))
