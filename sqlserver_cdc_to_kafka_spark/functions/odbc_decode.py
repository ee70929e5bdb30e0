"""Driver-side wire decoders + sizing heuristics the reference implements as
ODBC output converters and startup logic (SURVEY §2.8 F12/F13, §2.1 S10).

In a JDBC Spark deployment the connector performs these conversions; they
are kept as engine utilities for parity (and for any custom reader that
receives raw SQL Server wire values)."""

from __future__ import annotations

import datetime
import struct


def utf16_tolerant_decode(raw: bytes) -> str:
    """F12 (``sql_query_subprocess.py:183-191``): decode UTF-16-LE that may
    end mid-surrogate-pair (SQL Server truncates NVARCHAR at a byte limit,
    possibly splitting a pair). A trailing odd byte or lone surrogate is
    dropped rather than raising."""
    if len(raw) % 2:
        raw = raw[:-1]
    return raw.decode("utf-16-le", errors="ignore")


def decode_datetimeoffset(raw: bytes) -> datetime.datetime:
    """F13 (``sql_query_subprocess.py:193-198``): unpack SQL Server's
    DATETIMEOFFSET wire struct ``<6hI2h`` — (y, mo, d, h, mi, s, ns,
    tz_hours, tz_minutes) — into a tz-aware datetime."""
    y, mo, d, h, mi, s, ns, tzh, tzm = struct.unpack("<6hI2h", raw)
    tz = datetime.timezone(datetime.timedelta(hours=tzh, minutes=tzm))
    return datetime.datetime(y, mo, d, h, mi, s, ns // 1000, tz)


def encode_datetimeoffset(dt: datetime.datetime) -> bytes:
    """Inverse of decode_datetimeoffset (test support / replay path)."""
    off = dt.utcoffset() or datetime.timedelta()
    total_min = int(off.total_seconds() // 60)
    return struct.pack(
        "<6hI2h",
        dt.year,
        dt.month,
        dt.day,
        dt.hour,
        dt.minute,
        dt.second,
        dt.microsecond * 1000,
        int(total_min / 60) if total_min < 0 else total_min // 60,
        abs(total_min) % 60 * (1 if total_min >= 0 else -1),
    )


MAX_AUTO_PARTITIONS = 100  # build_startup_state.py:117-119
ROWS_PER_SEC_PER_PARTITION = 10  # build_startup_state.py:110-116


def partition_count_for_rate(rows_per_second: float) -> int:
    """S10 (``build_startup_state.py:107-121``): topic partition sizing —
    one partition per ~10 change rows/s, at least 1; refuse absurd rates
    (the reference aborts above 100 partitions)."""
    n = max(1, int(rows_per_second / ROWS_PER_SEC_PER_PARTITION))
    if n > MAX_AUTO_PARTITIONS:
        raise ValueError(
            f"computed partition count {n} exceeds {MAX_AUTO_PARTITIONS}; "
            "size this topic explicitly"
        )
    return n
