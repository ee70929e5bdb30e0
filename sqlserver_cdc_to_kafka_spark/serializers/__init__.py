"""Serializer strategy surface (SURVEY §2.10 X1).

The reference selects a message serializer by dotted path
(``cdc_kafka/serializers/__init__.py:23-57``); ours selects among:

- ``JsonSerializer`` (always available — built-in ``to_json``/``from_json``,
  JVM-side, whole-stage-codegen friendly);
- ``AvroSerializer`` (schema generation is pure-Python and always works;
  wire encode/decode needs the external spark-avro package and raises a
  clear error when it is absent — this container does not ship it).
"""

from __future__ import annotations

from sqlserver_cdc_to_kafka_spark.serializers.avro_schema import (  # noqa: F401
    avro_key_schema,
    avro_value_schema,
    spark_type_to_avro,
)
from sqlserver_cdc_to_kafka_spark.serializers.json_serde import (  # noqa: F401
    JsonSerializer,
)


def get_serializer(name: str = "json"):
    """X1 (options.py:308-314): config-selected serializer strategy."""
    if name == "json":
        return JsonSerializer()
    if name == "avro":
        from sqlserver_cdc_to_kafka_spark.serializers.avro_serde import AvroSerializer

        return AvroSerializer()
    raise ValueError(f"unknown serializer {name!r}")
