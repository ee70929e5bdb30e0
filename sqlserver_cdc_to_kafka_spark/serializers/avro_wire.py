"""Avro wire primitives (SURVEY §2.8 F7/F8) — pure-Python reference
implementations of the byte-level encodings the reference hand-rolls
(``cdc_kafka/serializers/avro.py:677-745``): decimal → scaled two's-complement
bytes, zigzag varint, little-endian float packing.

With the spark-avro package present, ``to_avro`` performs these inside the
JVM; these functions document and test the exact wire semantics (and back
the driver-side encoding of progress/metadata records, which never flow
through a DataFrame)."""

from __future__ import annotations

import decimal
import struct


def decimal_to_bytes(value: decimal.Decimal, scale: int) -> bytes:
    """Avro decimal logical type: the unscaled integer as minimal-length
    big-endian two's complement. Raises if the value has more fractional
    digits than the declared scale (a lossy write must never be silent)."""
    sign, digits, exponent = value.as_tuple()
    if exponent < -scale:
        raise ValueError(f"scale of {value} exceeds declared scale {scale}")
    unscaled = int(value.scaleb(scale))
    if unscaled == 0:
        return b"\x00"
    length = (unscaled.bit_length() + 8) // 8  # +1 sign bit, round up
    return unscaled.to_bytes(length, "big", signed=True)


def bytes_to_decimal(raw: bytes, scale: int) -> decimal.Decimal:
    unscaled = int.from_bytes(raw, "big", signed=True)
    return decimal.Decimal(unscaled).scaleb(-scale)


def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def zigzag_decode(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


def write_varint(n: int) -> bytes:
    """Avro long: zigzag + base-128 varint."""
    z = zigzag_encode(n)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_varint(raw: bytes, pos: int = 0) -> tuple[int, int]:
    """-> (value, next_pos)."""
    shift = z = 0
    while True:
        b = raw[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            return zigzag_decode(z), pos
        shift += 7


def pack_float(v: float) -> bytes:
    return struct.pack("<f", v)


def pack_double(v: float) -> bytes:
    return struct.pack("<d", v)
