"""JSON wire codec — the always-available serializer strategy.

Shape mirrors the reference's SerializerAbstract
(``cdc_kafka/serializers/__init__.py:23-57``): register a table's schema +
key columns, then serialize data messages to (key, value) byte columns and
deserialize back. Everything is built-in ``to_json``/``from_json`` — JVM
expressions inside whole-stage codegen, no Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class TableRegistration:
    topic: str
    schema: T.StructType
    key_cols: list[str]


@dataclass
class JsonSerializer:
    """X1 strategy: JSON encode/decode of the CDC envelope."""

    registrations: dict[str, TableRegistration] = field(default_factory=dict)

    def register_table(self, topic: str, schema: T.StructType, key_cols: list[str]) -> None:
        self.registrations[topic] = TableRegistration(topic, schema, list(key_cols))

    def serialize(self, df: DataFrame, topic: str) -> DataFrame:
        """(all columns) -> (key: string, value: string) message columns.
        Key is the PK struct; value is the full envelope row."""
        reg = self.registrations[topic]
        cols = [f.name for f in reg.schema.fields]
        key = F.to_json(F.struct(*[F.col(c) for c in reg.key_cols]))
        value = F.to_json(F.struct(*[F.col(c) for c in cols]))
        return df.select(key.alias("key"), value.alias("value"))

    def deserialize(self, messages: DataFrame, topic: str) -> DataFrame:
        """(value: string) -> typed envelope columns (schema round-trip)."""
        reg = self.registrations[topic]
        return messages.select(
            F.from_json(F.col("value"), reg.schema).alias("v")
        ).select("v.*")

    def roundtrip_equal(self, df: DataFrame, topic: str) -> Column:
        """Expression: does serialize→deserialize reproduce the row exactly?
        (the reference's 1-in-50k serializer self-check, avro.py:559-609 —
        here cheap enough to run on every row)."""
        reg = self.registrations[topic]
        cols = [f.name for f in reg.schema.fields]
        orig = F.struct(*[F.col(c) for c in cols])
        rt = F.from_json(F.to_json(orig), reg.schema)
        return rt.eqNullSafe(orig)
