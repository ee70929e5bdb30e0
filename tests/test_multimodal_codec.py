"""Unit tests for the real PPM codec behind the multimodal image path."""

from __future__ import annotations

import numpy as np
import pytest

from sqlserver_cdc_to_kafka_spark.pipeline.multimodal import (
    decode_ppm,
    encode_ppm,
    ppm_dims_for,
)


def test_roundtrip():
    w, h, seed = 7, 5, 123
    payload = encode_ppm(w, h, seed)
    rw, rh, arr = decode_ppm(payload)
    assert (rw, rh) == (w, h)
    assert arr.shape == (h, w, 3)
    expected = ((seed + np.arange(w * h * 3)) % 256).reshape(h, w, 3)
    assert (arr == expected).all()


def test_decode_tolerates_header_comments():
    # a PPM written by netpbm tools often carries a '# creator' comment
    payload = b"P6\n# made by hand\n3 2\n# another\n255\n" + bytes(range(18))
    w, h, arr = decode_ppm(payload)
    assert (w, h) == (3, 2)
    assert arr.ravel().tolist() == list(range(18))


@pytest.mark.parametrize(
    "payload,err",
    [
        (b"P5\n1 1\n255\n\x00", "magic"),
        (b"P6\n2 2\n255\n\x00\x00", "short raster"),
        (b"P6\n1 1\n65535\n\x00\x00", "maxval"),
    ],
)
def test_decode_rejects_bad_input(payload, err):
    with pytest.raises(ValueError, match=err):
        decode_ppm(payload)


def test_dims_formula_bounds():
    for doc_id in range(0, 2000, 37):
        w, h, seed = ppm_dims_for(doc_id)
        assert 4 <= w <= 16 and 3 <= h <= 9 and 0 <= seed <= 255


def test_no_notimplemented_on_data_path():
    import inspect

    from sqlserver_cdc_to_kafka_spark.pipeline import multimodal

    src = inspect.getsource(multimodal)
    assert "NotImplementedError" not in src


class TestWav:
    def test_roundtrip(self):
        from sqlserver_cdc_to_kafka_spark.pipeline.multimodal import (
            decode_wav,
            encode_wav,
        )

        payload = encode_wav(300, 16000, 4242)
        rate, samples = decode_wav(payload)
        assert rate == 16000 and len(samples) == 300
        expected = ((4242 + 11 * np.arange(300)) % 65536) - 32768
        assert (samples == expected).all()
        assert len(payload) == 44 + 600

    def test_tolerates_extra_chunks(self):
        # real encoders often insert a LIST/INFO chunk between fmt and data
        from sqlserver_cdc_to_kafka_spark.pipeline.multimodal import (
            decode_wav,
            encode_wav,
        )
        import struct

        base = encode_wav(10, 8000, 7)
        fmt_chunk = base[12:36]
        data_chunk = base[36:]
        extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded odd chunk
        body = fmt_chunk + extra + data_chunk
        payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
        rate, samples = decode_wav(payload)
        assert rate == 8000 and len(samples) == 10

    def test_rejects_bad_input(self):
        from sqlserver_cdc_to_kafka_spark.pipeline.multimodal import decode_wav
        import struct

        with pytest.raises(ValueError, match="magic"):
            decode_wav(b"OggS" + b"\x00" * 40)
        # stereo is unsupported
        hdr = (
            b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt "
            + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
            + b"data" + struct.pack("<I", 0)
        )
        with pytest.raises(ValueError, match="unsupported"):
            decode_wav(hdr)


def test_resize_nearest_exact_indexing():
    from sqlserver_cdc_to_kafka_spark.pipeline.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_nearest,
    )

    w, h, seed = 13, 6, 99
    _, _, arr = decode_ppm(encode_ppm(w, h, seed))
    small = resize_nearest(arr, 8, 5)
    assert small.shape == (5, 8, 3)
    for y in range(5):
        for x in range(8):
            sx, sy = (x * w) // 8, (y * h) // 5
            assert (small[y, x] == arr[sy, sx]).all()


def test_ppm_stream_demux_walks_frames_by_header():
    """Stream demux must slice frames by their own parsed headers — a
    mixed-dims stream (impossible with fixed out-of-band metadata)
    round-trips frame-exactly."""
    import numpy as np

    from sqlserver_cdc_to_kafka_spark.pipeline.multimodal import (
        decode_ppm_stream,
        encode_ppm,
    )

    stream = (
        encode_ppm(4, 3, 7)
        + encode_ppm(16, 9, 250)  # wraps mod 256 mid-raster
        + encode_ppm(5, 5, 0)
    )
    frames = decode_ppm_stream(stream)
    assert [(w, h) for w, h, _ in frames] == [(4, 3), (16, 9), (5, 5)]
    for (w, h, arr), seed in zip(frames, (7, 250, 0)):
        want = (seed + np.arange(w * h * 3)) % 256
        assert (arr.flatten() == want).all()
