"""Serialization strategy + schema-evolution decision tree tests
(SURVEY §1.2-1.4, §2.10 X1, Phase 5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sqlserver_cdc_to_kafka_spark.fixtures.cdc_events import cdc_events
from sqlserver_cdc_to_kafka_spark.plans.evolution import (
    EvolutionDecision,
    ddl_change_requires_new_snapshot,
    schema_checksum,
)
from sqlserver_cdc_to_kafka_spark.serializers import get_serializer
from sqlserver_cdc_to_kafka_spark.serializers.avro_schema import (
    avro_key_schema,
    avro_value_schema,
    spark_type_to_avro,
    subject_names,
)


def _schema(*fields):
    return T.StructType([T.StructField(n, dt, nullable) for n, dt, nullable in fields])


# ---------- Avro schema generation ----------

def test_avro_type_mapping():
    assert spark_type_to_avro(T.DecimalType(15, 2)) == {
        "type": "bytes", "logicalType": "decimal", "precision": 15, "scale": 2,
    }
    assert spark_type_to_avro(T.LongType()) == "long"
    assert spark_type_to_avro(T.IntegerType()) == "int"
    assert spark_type_to_avro(T.DateType()) == {"type": "int", "logicalType": "date"}
    assert spark_type_to_avro(T.TimestampType()) == "string"  # ISO-8601
    assert spark_type_to_avro(T.BinaryType()) == "bytes"
    with pytest.raises(ValueError):
        spark_type_to_avro(T.MapType(T.StringType(), T.StringType()))


def test_avro_value_schema_all_nullable_with_defaults():
    s = _schema(("id", T.LongType(), False), ("name", T.StringType(), True))
    v = avro_value_schema("db.dbo.t", s)
    assert v["name"] == "db_dbo_t_value"
    for f in v["fields"]:
        assert f["type"][0] == "null" and f["default"] is None


def test_avro_key_schema_nonnull_in_key_order():
    s = _schema(("a", T.LongType(), True), ("b", T.IntegerType(), True))
    k = avro_key_schema("t", s, ["b", "a"])
    assert [f["name"] for f in k["fields"]] == ["b", "a"]
    assert k["fields"][0]["type"] == "int"  # not a union
    assert subject_names("t") == ("t-key", "t-value")


def test_type_overrides():
    s = _schema(("id", T.LongType(), False), ("price", T.DecimalType(15, 2), True))
    v = avro_value_schema("t", s, type_overrides={"price": "string"})
    by_name = {f["name"]: f for f in v["fields"]}
    assert by_name["price"]["type"] == ["null", "string"]
    assert by_name["id"]["type"] == ["null", "long"]


def test_updated_fields_enum():
    s = _schema(("__updated_fields", T.ArrayType(T.StringType()), True))
    v = avro_value_schema("t", s, updated_fields_enum=["c1", "c2"])
    items = v["fields"][0]["type"][1]["items"]
    assert items["type"] == "enum" and items["symbols"] == ["c1", "c2"]


# ---------- JSON wire codec ----------

def test_json_roundtrip_lossless(spark, sf_dir):
    feed = cdc_events(spark, sf_dir).limit(200)
    ser = get_serializer("json")
    ser.register_table("orders", feed.schema, ["o_orderkey"])
    msgs = ser.serialize(feed, "orders")
    assert msgs.columns == ["key", "value"]
    back = ser.deserialize(msgs, "orders")
    # from_json yields nullable fields (JSON can't carry NOT NULL); types match
    assert back.schema.simpleString() == feed.schema.simpleString()
    assert back.count() == feed.count()
    n_exact = feed.filter(ser.roundtrip_equal(feed, "orders")).count()
    assert n_exact == feed.count()


def test_avro_serializer_gated(spark):
    ser = get_serializer("avro")
    ser.register_table("t", _schema(("id", T.LongType(), False)), ["id"])
    assert '"name": "t_value"' in ser.value_schema_json("t")
    df = spark.range(1)
    with pytest.raises(RuntimeError, match="spark-avro"):
        ser.serialize(df, "t")


# ---------- schema-evolution decision tree ----------

OLD = _schema(("id", T.LongType(), False), ("v", T.IntegerType(), True))


def _dec(new, **kw) -> EvolutionDecision:
    return ddl_change_requires_new_snapshot(OLD, new, **kw)


def test_no_change_no_snapshot():
    assert not _dec(OLD).requires_snapshot


def test_dropped_column_requires_snapshot():
    d = _dec(_schema(("id", T.LongType(), False)))
    assert d.requires_snapshot and "dropped" in d.reasons[0]


def test_int_widening_is_compatible():
    d = _dec(_schema(("id", T.LongType(), False), ("v", T.LongType(), True)))
    assert not d.requires_snapshot


def test_int_narrowing_requires_snapshot():
    d = _dec(_schema(("id", T.IntegerType(), False), ("v", T.IntegerType(), True)))
    assert d.requires_snapshot


def test_type_change_requires_snapshot():
    d = _dec(_schema(("id", T.LongType(), False), ("v", T.StringType(), True)))
    assert d.requires_snapshot


def test_decimal_precision_change_requires_snapshot():
    old = _schema(("d", T.DecimalType(10, 2), True))
    new = _schema(("d", T.DecimalType(12, 2), True))
    assert ddl_change_requires_new_snapshot(old, new).requires_snapshot
    same = _schema(("d", T.DecimalType(10, 2), True))
    assert not ddl_change_requires_new_snapshot(old, same).requires_snapshot


def test_added_notnull_requires_snapshot():
    d = _dec(_schema(*[("id", T.LongType(), False), ("v", T.IntegerType(), True),
                       ("n", T.StringType(), False)]))
    assert d.requires_snapshot and "NOT NULL" in d.reasons[0]


NEW_NULLABLE = _schema(("id", T.LongType(), False), ("v", T.IntegerType(), True),
                       ("c", T.StringType(), True))


def test_added_nullable_fresh_empty_no_snapshot():
    d = _dec(NEW_NULLABLE, probe_has_nonnull_data=lambda c: False,
             column_age_seconds=lambda c: 10.0)
    assert not d.requires_snapshot


def test_added_nullable_with_data_requires_snapshot():
    d = _dec(NEW_NULLABLE, probe_has_nonnull_data=lambda c: True,
             column_age_seconds=lambda c: 10.0)
    assert d.requires_snapshot


def test_added_nullable_old_requires_snapshot():
    d = _dec(NEW_NULLABLE, column_age_seconds=lambda c: 7200.0)
    assert d.requires_snapshot


def test_computedness_change_requires_snapshot():
    old = T.StructType([T.StructField("v", T.IntegerType(), True)])
    new = T.StructType([
        T.StructField("v", T.IntegerType(), True, metadata={"computed": True})
    ])
    assert ddl_change_requires_new_snapshot(old, new).requires_snapshot


def test_schema_checksum_detects_change():
    assert schema_checksum(OLD) == schema_checksum(OLD)
    assert schema_checksum(OLD) != schema_checksum(NEW_NULLABLE)
    # nullability flips the checksum too (sql_queries.py:20-25 columns)
    flipped = _schema(("id", T.LongType(), True), ("v", T.IntegerType(), True))
    assert schema_checksum(OLD) != schema_checksum(flipped)


def test_make_column_probe(spark, sf_dir):
    from sqlserver_cdc_to_kafka_spark.plans.evolution import make_column_probe
    from sqlserver_cdc_to_kafka_spark.tables import load_table
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "new_col", F.lit(None).cast("string")
    )
    probe = make_column_probe(orders)
    assert not probe("new_col")  # all-null fresh column -> no re-snapshot
    assert probe("o_orderkey")  # carries data -> re-snapshot
    tiny_threshold = make_column_probe(orders, max_rows=10)
    assert tiny_threshold("new_col")  # "too big to probe" -> conservative True
