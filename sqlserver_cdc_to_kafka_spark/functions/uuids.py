"""F10: SQL Server uniqueidentifier sort order.

Reference (``cdc_kafka/validation.py:19-41``): SQL Server orders GUIDs by a
byte permutation — bytes (10..15, 8, 9, 7, 6, 5, 4, 3, 2, 1, 0) of the
canonical representation compared left-to-right. The validator needs the
same order to compare snapshot key ranges.

Spark mapping: rebuild that byte sequence as a hex string with built-in
substring/concat (codegen'd, no UDF); ordering by the hex string equals
ordering by the permuted bytes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_server_uuid_sort_key(uuid_col: Column) -> Column:
    """Lowercased dash-free hex permuted into SQL Server comparison order."""
    h = F.lower(F.regexp_replace(uuid_col, "-", ""))

    def byte_hex(i: int) -> Column:  # byte i of the canonical GUID
        return F.substring(h, 2 * i + 1, 2)

    order = [10, 11, 12, 13, 14, 15, 8, 9, 7, 6, 5, 4, 3, 2, 1, 0]
    return F.concat(*[byte_hex(i) for i in order])
