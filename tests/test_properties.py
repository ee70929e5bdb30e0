"""Property-based tests (hypothesis) for the byte-level semantics SURVEY
§7 flags as 'easy to get subtly wrong': UTF-8 budget truncation, UTF-16
tolerant decode, datetimeoffset codec, hex index ordering."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sqlserver_cdc_to_kafka_spark.functions.odbc_decode import (
    decode_datetimeoffset,
    encode_datetimeoffset,
    utf16_tolerant_decode,
)

# ---- F1 semantics (python reference of the pandas UDF body) ----


def _utf8_cut(x: str, max_bytes: int) -> str:
    if max_bytes < 1:
        return ""
    return x.encode("utf-8")[:max_bytes].decode("utf-8", errors="ignore")


@given(st.text(max_size=64), st.integers(min_value=0, max_value=80))
def test_utf8_cut_never_exceeds_budget_and_is_prefix(s, n):
    out = _utf8_cut(s, n)
    assert len(out.encode("utf-8")) <= n
    assert s.startswith(out)
    # maximality: adding the next char would exceed the budget
    if len(out) < len(s):
        nxt = s[: len(out) + 1]
        assert len(nxt.encode("utf-8")) > n


# ---- F12 ----


@given(st.text(max_size=64), st.integers(min_value=0, max_value=6))
def test_utf16_tolerant_decode_of_truncated_buffers(s, cut):
    raw = s.encode("utf-16-le")
    out = utf16_tolerant_decode(raw[: len(raw) - cut] if cut else raw)
    # decodable prefix of the original (surrogate fragments dropped)
    assert s.startswith(out) or out == s


# ---- F13 ----


@given(
    st.datetimes(
        min_value=datetime.datetime(1, 1, 1),
        max_value=datetime.datetime(9999, 12, 28),
    ),
    st.integers(min_value=-14 * 60, max_value=14 * 60).filter(lambda m: m % 15 == 0),
)
@settings(max_examples=200)
def test_datetimeoffset_roundtrip_property(dt, off_minutes):
    tz = datetime.timezone(datetime.timedelta(minutes=off_minutes))
    dt = dt.replace(tzinfo=tz, microsecond=(dt.microsecond // 1000) * 1000)
    assert decode_datetimeoffset(encode_datetimeoffset(dt)) == dt


# ---- F3/F4: hex persistence form preserves order ----


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=2, max_size=20))
def test_hex_form_orders_like_integers(seqs):
    hexes = ["0x" + format(s, "020x") for s in seqs]
    assert sorted(hexes) == [
        "0x" + format(s, "020x") for s in sorted(seqs)
    ]


# ---- F7/F8: Avro wire primitives ----

import decimal as _decimal

from sqlserver_cdc_to_kafka_spark.serializers.avro_wire import (
    bytes_to_decimal,
    decimal_to_bytes,
    read_varint,
    write_varint,
)


@given(
    st.decimals(
        min_value=-(10**15), max_value=10**15, places=2, allow_nan=False,
        allow_infinity=False,
    )
)
def test_decimal_wire_roundtrip(d):
    raw = decimal_to_bytes(d, scale=2)
    assert bytes_to_decimal(raw, scale=2) == d
    # minimality: dropping the leading byte changes the value (no padding)
    if len(raw) > 1:
        assert bytes_to_decimal(raw[1:], 2) != d or raw[0] in (0, 0xFF)


def test_decimal_scale_overflow_raises():
    with pytest.raises(ValueError):
        decimal_to_bytes(_decimal.Decimal("1.234"), scale=2)


def test_decimal_known_vectors():
    # Avro spec examples: unscaled two's complement, big endian
    assert decimal_to_bytes(_decimal.Decimal("1.00"), 2) == b"\x64"
    assert decimal_to_bytes(_decimal.Decimal("-1.00"), 2) == b"\x9c"
    assert decimal_to_bytes(_decimal.Decimal("0"), 2) == b"\x00"


@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_varint_roundtrip(n):
    raw = write_varint(n)
    got, pos = read_varint(raw)
    assert got == n and pos == len(raw)


def test_varint_known_vectors():
    # zigzag: 0->0, -1->1, 1->2, -2->3 (Avro spec)
    assert write_varint(0) == b"\x00"
    assert write_varint(-1) == b"\x01"
    assert write_varint(1) == b"\x02"
    assert write_varint(-64) == b"\x7f"
    assert write_varint(64) == b"\x80\x01"
