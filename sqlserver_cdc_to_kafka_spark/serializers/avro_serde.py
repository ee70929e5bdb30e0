"""Avro wire codec — gated on the external spark-avro package.

Schema generation (avro_schema.py) is pure Python and always available; the
actual ``to_avro``/``from_avro`` expressions require the spark-avro jar,
which is an external Spark package not shipped in this environment. The
strategy raises a clear error at use (not import) time so configuration
errors surface early but the module stays importable everywhere.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlserver_cdc_to_kafka_spark.serializers.avro_schema import (
    avro_key_schema,
    avro_value_schema,
)
from sqlserver_cdc_to_kafka_spark.serializers.json_serde import TableRegistration


class _AvroUnavailable(RuntimeError):
    pass


_MISSING_MSG = (
    "Avro serialization requires the spark-avro package "
    "(--packages org.apache.spark:spark-avro_2.13:<spark version>); "
    "it is not available in this environment. Use the 'json' serializer "
    "instead."
)


def _avro_functions():
    """The python wrapper always imports; the jar may still be absent — that
    surfaces as AVRO_NOT_LOADED AnalysisException at plan time, which the
    callers below convert to the same clear RuntimeError."""
    try:
        from pyspark.sql.avro.functions import from_avro, to_avro

        return to_avro, from_avro
    except Exception as e:  # pragma: no cover - environment-dependent
        raise _AvroUnavailable(_MISSING_MSG) from e


def _reraise_if_not_loaded(e: Exception):
    if "AVRO_NOT_LOADED" in str(e):
        raise _AvroUnavailable(_MISSING_MSG) from e
    raise e


@dataclass
class AvroSerializer:
    """X1 strategy: Avro encode/decode with generated record schemas."""

    registrations: dict[str, TableRegistration] = field(default_factory=dict)

    def register_table(self, topic: str, schema: T.StructType, key_cols: list[str]) -> None:
        self.registrations[topic] = TableRegistration(topic, schema, list(key_cols))

    def value_schema_json(self, topic: str) -> str:
        reg = self.registrations[topic]
        return json.dumps(avro_value_schema(topic, reg.schema))

    def key_schema_json(self, topic: str) -> str:
        reg = self.registrations[topic]
        return json.dumps(avro_key_schema(topic, reg.schema, reg.key_cols))

    def serialize(self, df: DataFrame, topic: str) -> DataFrame:
        to_avro, _ = _avro_functions()
        reg = self.registrations[topic]
        cols = [f.name for f in reg.schema.fields]
        key = to_avro(F.struct(*[F.col(c) for c in reg.key_cols]))
        value = to_avro(F.struct(*[F.col(c) for c in cols]))
        try:
            return df.select(key.alias("key"), value.alias("value"))
        except Exception as e:
            _reraise_if_not_loaded(e)

    def deserialize(self, messages: DataFrame, topic: str) -> DataFrame:
        _, from_avro = _avro_functions()
        schema_json = json.dumps(
            _spark_struct_as_avro(self.registrations[topic].schema, topic)
        )
        try:
            return messages.select(
                from_avro(F.col("value"), schema_json).alias("v")
            ).select("v.*")
        except Exception as e:
            _reraise_if_not_loaded(e)


def _spark_struct_as_avro(schema: T.StructType, topic: str):
    return avro_value_schema(topic, schema)
