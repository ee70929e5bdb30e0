"""F3: LSN hex encode/decode (``cdc_kafka/change_index.py:57-72``).

The reference persists 10-byte LSN/seqval values as ``0x<20 hex chars>``
strings. Pure built-in expressions — no UDF."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LSN_HEX_WIDTH = 20  # 10 bytes


def lsn_hex(seq: Column) -> Column:
    """bigint → ``0x``-prefixed zero-padded lowercase hex string."""
    return F.concat(F.lit("0x"), F.lpad(F.lower(F.hex(seq)), LSN_HEX_WIDTH, "0"))


def lsn_hex_decode(hex_str: Column) -> Column:
    """``0x<hex>`` string → bigint (inverse of lsn_hex for values < 2^63)."""
    return F.conv(F.substring(hex_str, 3, LSN_HEX_WIDTH), 16, 10).cast("bigint")
