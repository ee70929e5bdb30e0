"""F1: UTF-8 byte-budget string truncation.

Reference (``cdc_kafka/tracked_tables.py:362-395``): truncate a string to at
most N UTF-8 **bytes** without splitting a multi-byte character, reporting
the resulting byte length (surfaced as a message header,
``tracked_tables.py:407-415``).

No Spark built-in is byte-aware (``substring`` counts chars), so this is one
of the few genuine pandas-UDF cases (SURVEY §4 custom item 3). The UDF is
created inside a factory so cloudpickle serializes it by value — Python
workers never need this module importable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def utf8_truncate(col: Column, max_bytes: int) -> Column:
    """The string truncated to ≤ max_bytes UTF-8 bytes.
    ``encode[:N].decode(errors='ignore')`` drops exactly the trailing
    incomplete character, matching the reference's boundary fix. The
    resulting byte length (the reference's truncation header payload) is
    ``octet_length(utf8_truncate(...))`` — a built-in, so no struct UDF."""

    @F.pandas_udf("string")
    def _trunc(s: pd.Series) -> pd.Series:
        def cut(x):
            if x is None:
                return None
            if max_bytes < 1:
                return ""
            return x.encode("utf-8")[:max_bytes].decode("utf-8", errors="ignore")

        return s.map(cut)

    return _trunc(col)
