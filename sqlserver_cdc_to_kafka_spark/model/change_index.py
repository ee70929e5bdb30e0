"""ChangeIndex — the total order of the change stream.

Reference: ``cdc_kafka/change_index.py:8-80`` models the position of a change
as ``(lsn: 10 bytes, command_id: int, seqval: 10 bytes, operation: int)`` with
lexicographic comparison, ``0x<hex>`` string persistence, sentinel bounds and
a heartbeat predicate.

Spark mapping (SURVEY.md §1.1 #3): a ``struct<lsn:binary, command_id:int,
seqval:binary, operation:int>`` column. Spark orders structs field-wise and
binary columns lexicographically (unsigned byte-wise), so native
``orderBy(change_index_col(...))`` reproduces ``ChangeIndex.__lt__``
(``change_index.py:38-47``) exactly — no UDF, stays inside whole-stage
codegen, and range-partitions cleanly at scale (``repartitionByRange`` on the
struct gives a globally ordered layout without a single-partition sort).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

LSN_BYTES = 10

CHANGE_INDEX_FIELDS = ("lsn", "command_id", "seqval", "operation")

CHANGE_INDEX_TYPE = T.StructType(
    [
        T.StructField("lsn", T.BinaryType(), False),
        T.StructField("command_id", T.IntegerType(), False),
        T.StructField("seqval", T.BinaryType(), False),
        T.StructField("operation", T.IntegerType(), False),
    ]
)

# Sentinels mirror cdc_kafka/change_index.py:79-80.
LOWEST_CHANGE_INDEX = (b"\x00" * LSN_BYTES, 0, b"\x00" * LSN_BYTES, 0)
HIGHEST_CHANGE_INDEX = (b"\xff" * LSN_BYTES, 0xFFFFFFF, b"\xff" * LSN_BYTES, 4)


def change_index_col(
    lsn: str | Column = "__log_lsn",
    command_id: str | Column = "__command_id",
    seqval: str | Column = "__log_seqval",
    operation: str | Column = "__operation",
) -> Column:
    """The ordering struct from envelope columns (SURVEY.md §1.4)."""
    cols = [
        c if isinstance(c, Column) else F.col(c)
        for c in (lsn, command_id, seqval, operation)
    ]
    return F.struct(
        cols[0].alias("lsn"),
        cols[1].alias("command_id"),
        cols[2].alias("seqval"),
        cols[3].alias("operation"),
    )


def change_index_literal(value: tuple[bytes, int, bytes, int]) -> Column:
    """A literal ChangeIndex struct (for keyset predicates / sentinels)."""
    lsn, command_id, seqval, operation = value
    return F.struct(
        F.lit(lsn).alias("lsn"),
        F.lit(command_id).cast("int").alias("command_id"),
        F.lit(seqval).alias("seqval"),
        F.lit(operation).cast("int").alias("operation"),
    )


def change_index_from_seq(seq: Column) -> Column:
    """Build a full ChangeIndex struct from a scalar monotone sequence number.

    The test fixture (FIXTURES.md `cdc_events`) uses a bigint surrogate; this
    expands it into the 10-byte-LSN shape the reference persists
    (``change_index.py:57-72``): lsn = zero-padded big-endian bytes of seq.
    """
    # 20 hex chars == 10 bytes, matching the reference's LSN width.
    hex_str = F.lpad(F.lower(F.hex(seq)), LSN_BYTES * 2, "0")
    lsn = F.unhex(hex_str)
    return F.struct(
        lsn.alias("lsn"),
        F.lit(0).alias("command_id"),
        lsn.alias("seqval"),
        F.lit(0).alias("operation"),
    )


def change_index_hex(seq: Column) -> Column:
    """``0x<20 hex chars>`` string persistence form (change_index.py:57-59)."""
    return F.concat(F.lit("0x"), F.lpad(F.lower(F.hex(seq)), LSN_BYTES * 2, "0"))


def is_probably_heartbeat(idx: Column) -> Column:
    """Heartbeat predicate (change_index.py:74-76): seqval and operation equal
    to the HIGHEST_CHANGE_INDEX sentinel values."""
    return (idx["seqval"] == F.lit(HIGHEST_CHANGE_INDEX[2])) & (
        idx["operation"] == F.lit(HIGHEST_CHANGE_INDEX[3])
    )
