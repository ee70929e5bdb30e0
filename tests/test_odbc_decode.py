"""F12/F13/S10 decoder + sizing tests (byte-level semantics, SURVEY 'hard' #3)."""

from __future__ import annotations

import datetime

import pytest

from sqlserver_cdc_to_kafka_spark.functions.odbc_decode import (
    decode_datetimeoffset,
    encode_datetimeoffset,
    partition_count_for_rate,
    utf16_tolerant_decode,
)


def test_utf16_clean_roundtrip():
    s = "héllo wörld ∑ 漢字"
    assert utf16_tolerant_decode(s.encode("utf-16-le")) == s


def test_utf16_odd_byte_dropped():
    raw = "abc".encode("utf-16-le") + b"\x41"  # half a code unit
    assert utf16_tolerant_decode(raw) == "abc"


def test_utf16_split_surrogate_pair_dropped():
    s = "x\U0001f600"  # emoji = surrogate pair in UTF-16
    raw = s.encode("utf-16-le")
    cut = raw[:-2]  # drop low surrogate, keep lone high surrogate
    assert utf16_tolerant_decode(cut) == "x"


@pytest.mark.parametrize(
    "dt",
    [
        datetime.datetime(2024, 3, 1, 12, 30, 45, 123456, datetime.timezone.utc),
        datetime.datetime(
            1999, 12, 31, 23, 59, 59, 0,
            datetime.timezone(datetime.timedelta(hours=5, minutes=30)),
        ),
        datetime.datetime(
            2024, 1, 1, 0, 0, 0, 1000,
            datetime.timezone(datetime.timedelta(hours=-8)),
        ),
    ],
)
def test_datetimeoffset_roundtrip(dt):
    assert decode_datetimeoffset(encode_datetimeoffset(dt)) == dt


def test_partition_sizing():
    assert partition_count_for_rate(0) == 1
    assert partition_count_for_rate(9.9) == 1
    assert partition_count_for_rate(250) == 25
    assert partition_count_for_rate(1000) == 100
    with pytest.raises(ValueError):
        partition_count_for_rate(1011)
