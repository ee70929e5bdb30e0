"""F2: synthetic key for PK-less tables.

Reference (``cdc_kafka/tracked_tables.py:418-426``): tables without a PK get
a deterministic ``_row_hash`` message key derived from all field names and
values. Carries the reference's documented caveat VERBATIM: the key changes
if the table's column set changes (``tracked_tables.py:421-423``) — do not
"fix" silently.

Spark mapping: ``md5`` over a field-separated concatenation of names and
stringified values (built-in, codegen'd). Callers must pre-cast any
float/double columns to an exact textual form — raw double→string rendering
is engine-specific.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

_SEP = "\x1f"  # unit separator: cannot appear in the fixture data
_NULL = "<NULL>"


def synthetic_row_hash(cols: Sequence[str]) -> Column:
    """md5 over (name, value) pairs of every column, null-safe."""
    parts: list[Column] = []
    for c in cols:
        parts.append(F.lit(c))
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit(_NULL)))
    return F.md5(F.concat_ws(_SEP, *parts))
