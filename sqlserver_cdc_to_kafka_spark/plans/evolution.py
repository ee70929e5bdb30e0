"""Schema-evolution decision tree (SURVEY §1.3).

Reference: ``cdc_kafka/build_startup_state.py:235-383``
(``ddl_change_requires_new_snapshot``). When a table gets a new capture
instance (≈ a new StructType for the same source), decide whether a full
re-backfill (snapshot) is required or the change stream can simply continue
with the evolved schema. Pure driver logic over StructTypes — no Catalyst.

Rules preserved from the reference:
- any dropped column                 → re-snapshot (build_startup_state.py:272-275)
- computed-ness change               → re-snapshot (281-286); Spark has no
  computed columns, so the flag rides in StructField.metadata['computed']
- serialization-visible type change  → re-snapshot (288-317), EXCEPT pure
  integer widening (tinyint→smallint→int→bigint) which is wire-compatible
- added NOT NULL column              → re-snapshot (319-324)
- added nullable column              → re-snapshot only if the probe finds
  actual non-null data, or the column is older than
  NEW_COLUMN_AGE_THRESHOLD_S (326-381, constants.py:16)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field as dc_field

from pyspark.sql import types as T

NEW_COLUMN_AGE_THRESHOLD_S = 3600  # constants.py:16

_INT_WIDTH = {"byte": 1, "short": 2, "integer": 4, "long": 8}


@dataclass
class EvolutionDecision:
    requires_snapshot: bool
    reasons: list[str] = dc_field(default_factory=list)


def _is_int(dt: T.DataType) -> bool:
    return dt.typeName() in _INT_WIDTH


def _widening_int_change(old: T.DataType, new: T.DataType) -> bool:
    """int-width widening is not serialization-visible (the reference skips
    re-snapshot for it: build_startup_state.py:296-303)."""
    return _is_int(old) and _is_int(new) and _INT_WIDTH[new.typeName()] >= _INT_WIDTH[old.typeName()]


def _serialization_visible(old: T.DataType, new: T.DataType) -> bool:
    if old == new:
        return False
    if _widening_int_change(old, new):
        return False
    if isinstance(old, T.DecimalType) and isinstance(new, T.DecimalType):
        # precision/scale change alters the wire decimal encoding
        return (old.precision, old.scale) != (new.precision, new.scale)
    return True


def ddl_change_requires_new_snapshot(
    old: T.StructType,
    new: T.StructType,
    probe_has_nonnull_data: Callable[[str], bool] | None = None,
    column_age_seconds: Callable[[str], float] | None = None,
) -> EvolutionDecision:
    """Decide whether the evolved schema needs a re-backfill.

    ``probe_has_nonnull_data(col)``: the bounded probe scan the reference
    runs for small tables (build_startup_state.py:326-360) — pass a callable
    that checks ``df.filter(col.isNotNull()).limit(1).count() > 0``.
    ``column_age_seconds(col)``: DDL-history age of an added column; older
    than an hour means it may already carry data we never captured."""
    old_by_name = {f.name: f for f in old.fields}
    new_by_name = {f.name: f for f in new.fields}
    reasons: list[str] = []

    for name, f in old_by_name.items():
        nf = new_by_name.get(name)
        if nf is None:
            reasons.append(f"column {name!r} dropped")
            continue
        if f.metadata.get("computed", False) != nf.metadata.get("computed", False):
            reasons.append(f"column {name!r} computed-ness changed")
        if _serialization_visible(f.dataType, nf.dataType):
            reasons.append(
                f"column {name!r} type change {f.dataType.simpleString()} -> "
                f"{nf.dataType.simpleString()} is serialization-visible"
            )

    for name, nf in new_by_name.items():
        if name in old_by_name:
            continue
        if not nf.nullable:
            reasons.append(f"added NOT NULL column {name!r}")
            continue
        age = column_age_seconds(name) if column_age_seconds else 0.0
        if age > NEW_COLUMN_AGE_THRESHOLD_S:
            reasons.append(
                f"added nullable column {name!r} is {age:.0f}s old "
                f"(> {NEW_COLUMN_AGE_THRESHOLD_S}s) — may already hold data"
            )
            continue
        if probe_has_nonnull_data is not None and probe_has_nonnull_data(name):
            reasons.append(f"added nullable column {name!r} already has non-null data")

    return EvolutionDecision(bool(reasons), reasons)


def schema_checksum(schema: T.StructType) -> str:
    """Column-metadata fingerprint (sql_queries.py:20-25): detects schema
    change cheaply before running the full decision tree."""
    import hashlib

    parts = [
        f"{f.name}|{f.dataType.simpleString()}|{f.nullable}|"
        f"{f.metadata.get('computed', False)}"
        for f in schema.fields
    ]
    return hashlib.md5("\n".join(parts).encode()).hexdigest()


SMALL_TABLE_PROBE_THRESHOLD = 5_000_000  # constants.py:15


def make_column_probe(df, max_rows: int = SMALL_TABLE_PROBE_THRESHOLD):
    """A3 + the probe scan (build_startup_state.py:326-360) over a DataFrame:
    returns a ``probe_has_nonnull_data(col)`` callable for
    ``ddl_change_requires_new_snapshot``. Only probes tables small enough to
    scan cheaply (bounded count first — ``limit(n).count()`` never scans more
    than n rows); big tables conservatively report True (re-snapshot) since
    an unscanned column may hold data."""
    from pyspark.sql import functions as F

    def probe(col_name: str) -> bool:
        if df.limit(max_rows).count() >= max_rows:
            return True  # too big to probe — assume data exists
        return df.filter(F.col(col_name).isNotNull()).limit(1).count() > 0

    return probe
