"""Golden-bytes tests of the full CDC Avro envelope.

Every expected byte string here is HAND-DERIVED from the reference wire
layout (``cdc_kafka/serializers/avro.py:505-557`` plus the enum-array shape
at :229-236 and :534-543) — written out literally, never computed by the
code under test, so the encoder is pinned against the spec rather than
against itself."""

from __future__ import annotations

import decimal

from sqlserver_cdc_to_kafka_spark.serializers.avro_wire import (
    INSERT_OPERATION_ID,
    POST_UPDATE_OPERATION_ID,
    SNAPSHOT_OPERATION_ID,
    avro_decimal,
    avro_string,
    confluent_header,
    encode_envelope_key,
    encode_envelope_value,
    updated_fields_array,
    write_varint,
)

LSN = bytes.fromhex("0000002a0000013b0004")
SEQVAL = bytes.fromhex("0000002a0000013b0003")
EVENT_TIME = "2024-01-02T03:04:05.123456"


def _field_datums():
    # table: id INT, name VARCHAR, amount DECIMAL(9,2)
    return [
        write_varint(5),                                  # id = 5
        avro_string("ab"),                                # name = 'ab'
        avro_decimal(decimal.Decimal("1.50"), 2),         # amount = 1.50
    ]


def test_confluent_header_golden():
    # magic 0 + big-endian uint32 schema id (avro.py:514)
    assert confluent_header(7) == b"\x00\x00\x00\x00\x07"
    assert confluent_header(0x01020304) == b"\x00\x01\x02\x03\x04"


def test_lsn_string_comma_pun():
    """The reference packs ',0x<hex>' where the ',' (0x2C) doubles as the
    zigzag varint for length 22 (avro.py:525-531). avro_string of the bare
    '0x<hex>' must therefore produce a leading comma byte — the identical
    wire bytes without the pun."""
    encoded = avro_string(f"0x{LSN.hex()}")
    assert encoded[0:1] == b","
    assert encoded == b",0x0000002a0000013b0004"
    assert len(encoded) == 23


def test_updated_fields_all_columns_golden():
    # 3 columns, all updated: count 3, enum indices 1..3, terminator
    # (avro.py:229-236); zigzag: 3->6, 1->2, 2->4, 3->6
    assert updated_fields_array(3) == b"\x06\x02\x04\x06\x00"


def test_updated_fields_from_mask_golden():
    # mask 0b101 = columns 1 and 3 updated (avro.py:534-543):
    # count 2 -> \x04, ordinals 1 -> \x02 and 3 -> \x06, terminator
    assert updated_fields_array(3, b"\x05") == b"\x04\x02\x06\x00"
    # empty mask: zero-count array is just count 0 + terminator
    # empty array = bare terminator (Avro spec: a series of non-empty
    # blocks ended by a zero count; no zero-count block precedes it)
    assert updated_fields_array(3, b"\x00") == b"\x00"


def test_insert_envelope_value_golden():
    got = encode_envelope_value(
        value_schema_id=7,
        operation_id=INSERT_OPERATION_ID,
        event_time_iso=EVENT_TIME,
        lsn=LSN,
        command_id=1,
        seqval=SEQVAL,
        field_datums=_field_datums(),
    )
    want = (
        b"\x00\x00\x00\x00\x07"          # confluent header, schema id 7
        b"\x04"                          # __operation = 2 (zigzag 4)
        b"\x34" + EVENT_TIME.encode()    # __event_time: len 26 (zigzag 52='4')
        + b"\x02,0x0000002a0000013b0004"  # __log_lsn union(1) + str(22)
        b"\x02\x02"                      # __command_id union(1) + 1
        b"\x02,0x0000002a0000013b0003"   # __log_seqval union(1) + str(22)
        b"\x06\x02\x04\x06\x00"          # __updated_fields = all 3 cols
        b"\x02\x0a"                      # id: union(1) + 5 (zigzag 10)
        b"\x02\x04ab"                    # name: union(1) + len2 + 'ab'
        b"\x02\x04\x00\x96"              # amount: union(1) + bytes2 + 150 BE
    )
    assert got == want


def test_post_update_envelope_with_mask_and_null_golden():
    datums = _field_datums()
    datums[1] = None  # name is NULL in the post-update image
    got = encode_envelope_value(
        value_schema_id=7,
        operation_id=POST_UPDATE_OPERATION_ID,
        event_time_iso=EVENT_TIME,
        lsn=LSN,
        command_id=2,
        seqval=SEQVAL,
        field_datums=datums,
        update_mask=b"\x05",
    )
    want = (
        b"\x00\x00\x00\x00\x07"
        b"\x08"                          # __operation = 4 (zigzag 8)
        b"\x34" + EVENT_TIME.encode()
        + b"\x02,0x0000002a0000013b0004"
        b"\x02\x04"                      # __command_id = 2 (zigzag 4)
        b"\x02,0x0000002a0000013b0003"
        b"\x04\x02\x06\x00"              # mask 0b101 -> cols 1,3
        b"\x02\x0a"                      # id present
        b"\x00"                          # name NULL -> union branch 0
        b"\x02\x04\x00\x96"              # amount present
    )
    assert got == want


def test_snapshot_envelope_nulls_metadata_golden():
    got = encode_envelope_value(
        value_schema_id=7,
        operation_id=SNAPSHOT_OPERATION_ID,
        event_time_iso=EVENT_TIME,
        lsn=LSN,  # even with an LSN present, snapshots null the metadata
        command_id=9,
        seqval=SEQVAL,
        field_datums=_field_datums(),
    )
    want = (
        b"\x00\x00\x00\x00\x07"
        b"\x00"                          # __operation = 0
        b"\x34" + EVENT_TIME.encode()
        + b"\x00\x00\x00"                # lsn/command_id/seqval all null
        b"\x06\x02\x04\x06\x00"          # snapshot -> all columns updated
        b"\x02\x0a\x02\x04ab\x02\x04\x00\x96"
    )
    assert got == want


def test_key_envelope_golden():
    # key fields are serialized bare (no null-union tags; avro.py:553-557)
    got = encode_envelope_key(3, [write_varint(5)])
    assert got == b"\x00\x00\x00\x00\x03\x0a"


def test_negative_decimal_golden():
    # -1.50 at scale 2: unscaled -150, minimal two's complement 0xFF6A
    assert avro_decimal(decimal.Decimal("-1.50"), 2) == b"\x04\xff\x6a"


# --- decode: the envelope round-trip ---------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from sqlserver_cdc_to_kafka_spark.serializers.avro_wire import (
    avro_bool,
    avro_bytes,
    decode_envelope_value,
    pack_double,
)

_FIELD_KINDS = [
    ("string", lambda d: avro_string(d), st.text(max_size=40)),
    ("long", lambda d: write_varint(d), st.integers(-(2**62), 2**62)),
    ("double", lambda d: pack_double(d),
     st.floats(allow_nan=False, allow_infinity=False, width=64)),
    ("boolean", lambda d: avro_bool(d), st.booleans()),
    ("bytes", lambda d: avro_bytes(d), st.binary(max_size=32)),
    (("decimal", 4), lambda d: avro_decimal(d, 4),
     st.decimals(min_value=-10**9, max_value=10**9, places=4,
                 allow_nan=False, allow_infinity=False)),
]


@st.composite
def _envelopes(draw):
    n_fields = draw(st.integers(1, 6))
    kinds = [draw(st.sampled_from(_FIELD_KINDS)) for _ in range(n_fields)]
    values = [
        None if draw(st.booleans()) and i > 0 else draw(kinds[i][2])
        for i in range(n_fields)
    ]
    op = draw(st.sampled_from([0, 1, 2, 4]))
    if op == 0:
        lsn = command_id = seqval = None
        mask = None
    else:
        lsn = draw(st.binary(min_size=10, max_size=10))
        command_id = draw(st.integers(0, 2**31))
        seqval = draw(st.binary(min_size=10, max_size=10))
        mask = draw(st.binary(min_size=1, max_size=2)) if op == 4 else None
    return op, lsn, command_id, seqval, mask, kinds, values


@given(_envelopes())
@settings(max_examples=200, deadline=None)
def test_envelope_value_roundtrip(env):
    op, lsn, command_id, seqval, mask, kinds, values = env
    datums = [
        None if v is None else k[1](v) for k, v in zip(kinds, values)
    ]
    raw = encode_envelope_value(
        1234, op, "2024-01-01T00:00:00Z", lsn, command_id, seqval,
        datums, update_mask=mask,
    )
    got = decode_envelope_value(raw, [k[0] for k in kinds])
    assert got["schema_id"] == 1234
    assert got["operation_id"] == op
    assert got["event_time_iso"] == "2024-01-01T00:00:00Z"
    if op == 0:
        assert got["lsn"] is None and got["seqval"] is None
    else:
        assert got["lsn"] == lsn
        assert got["command_id"] == command_id
        assert got["seqval"] == seqval
    assert got["values"] == values
    if op in (0, 1, 2):
        assert got["updated_fields"] == list(range(1, len(values) + 1))
