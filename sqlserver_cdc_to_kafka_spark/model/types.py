"""SQL Server type → Spark type mapping (SURVEY.md §1.2).

Mirrors the reference's serializer type dispatch
(``cdc_kafka/serializers/avro.py:302-358``): the set of source types it
accepts and the logical type each maps to. Anything outside the table is a
hard error, matching ``avro.py:342-343``.
"""

from __future__ import annotations

from pyspark.sql import types as T


def spark_type_for_sql_server(
    type_name: str,
    decimal_precision: int | None = None,
    decimal_scale: int | None = None,
    always_use_longs: bool = False,
) -> T.DataType:
    t = type_name.lower()
    if t in ("decimal", "numeric"):
        return T.DecimalType(decimal_precision or 18, decimal_scale or 0)
    if t == "money":
        return T.DecimalType(19, 4)
    if t == "smallmoney":
        return T.DecimalType(10, 4)
    if t == "bigint":
        return T.LongType()
    if t in ("int", "smallint", "tinyint"):
        # --always-use-avro-longs analog (avro.py:327-328)
        return T.LongType() if always_use_longs else T.IntegerType()
    if t == "bit":
        return T.BooleanType()
    if t == "float":
        return T.DoubleType()
    if t == "real":
        return T.FloatType()
    if t == "date":
        return T.DateType()
    if t == "time":
        # time-millis logical type (avro.py:333-334); no TimeType in Spark —
        # millis-since-midnight int.
        return T.IntegerType()
    if t in ("datetime", "datetime2", "datetimeoffset", "smalldatetime"):
        return T.TimestampType()
    if t in ("char", "nchar", "varchar", "nvarchar", "text", "ntext", "xml"):
        return T.StringType()
    if t == "uniqueidentifier":
        return T.StringType()
    if t in ("binary", "varbinary", "image", "rowversion", "timestamp"):
        return T.BinaryType()
    raise ValueError(f"Unsupported SQL Server type: {type_name!r} (avro.py:342-343)")
