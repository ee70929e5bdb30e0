"""Avro schema generation from Spark schemas — the reference's schema
builder (``cdc_kafka/serializers/avro.py:270-404``) restated over StructType.

Semantics preserved:
- every VALUE field is nullable with ``null`` default so consumers survive
  column drops (``avro.py:283-300``);
- KEY fields are non-null (``avro.py:270-281``);
- subject naming ``<topic>-key`` / ``<topic>-value`` (``avro.py:273,287``);
- type mapping per SURVEY §1.2 (decimal→bytes+logicalType, date→int/date,
  timestamps→ISO-8601 string, binary→bytes);
- ``__updated_fields`` is an array over the column-name enum
  (``avro.py:390-404``).

Pure Python — no Avro library needed to *generate* schemas (the reference
hand-rolls its encoder the same way); wire encoding lives in avro_serde.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

AVRO_NAMESPACE = "spark_cdc"


def spark_type_to_avro(dt: T.DataType) -> Any:
    """SURVEY §1.2 mapping, Spark-side types → Avro wire types."""
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # datetimes ship as ISO-8601 strings (avro.py:335-337,731-734)
        return "string"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": spark_type_to_avro(dt.elementType)}
    raise ValueError(f"unsupported type for Avro mapping: {dt}")  # avro.py:342-343


def _nullable(avro_type: Any) -> list[Any]:
    return ["null", avro_type]


def avro_value_schema(
    topic: str,
    schema: T.StructType,
    updated_fields_enum: list[str] | None = None,
    type_overrides: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Value schema: all fields nullable + null default (drop-tolerant).

    ``type_overrides`` (X4, avro.py:254-268 / options.py: JSON map keyed by
    column name): force a column's Avro wire type regardless of its Spark
    type — e.g. ``{"o_totalprice": "string"}`` to ship decimals as strings
    for consumers without decimal-logical-type support."""
    overrides = type_overrides or {}
    fields = []
    for f in schema.fields:
        if f.name in overrides:
            fields.append(
                {"name": f.name, "type": _nullable(overrides[f.name]), "default": None}
            )
            continue
        if f.name == "__updated_fields" and updated_fields_enum is not None:
            ftype: Any = {
                "type": "array",
                "items": {
                    "type": "enum",
                    "name": f"{_sanitize(topic)}__updated_fields_enum",
                    "symbols": updated_fields_enum,
                },
            }
        else:
            ftype = spark_type_to_avro(f.dataType)
        fields.append({"name": f.name, "type": _nullable(ftype), "default": None})
    return {
        "type": "record",
        "name": f"{_sanitize(topic)}_value",
        "namespace": AVRO_NAMESPACE,
        "fields": fields,
    }


def avro_key_schema(topic: str, schema: T.StructType, key_cols: list[str]) -> dict[str, Any]:
    """Key schema: PK columns only, non-null, in key order."""
    by_name = {f.name: f for f in schema.fields}
    return {
        "type": "record",
        "name": f"{_sanitize(topic)}_key",
        "namespace": AVRO_NAMESPACE,
        "fields": [
            {"name": c, "type": spark_type_to_avro(by_name[c].dataType)}
            for c in key_cols
        ],
    }


def subject_names(topic: str) -> tuple[str, str]:
    """Schema-registry subject naming (avro.py:273,287)."""
    return f"{topic}-key", f"{topic}-value"


def _sanitize(topic: str) -> str:
    return "".join(ch if ch.isalnum() or ch == "_" else "_" for ch in topic)
