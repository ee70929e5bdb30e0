"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas`` (beyond-reference scope).

Design for 100 TB: media bytes ride as an opaque ``binary`` column next to
typed metadata; decode/resize/frame-sample run per-partition as Arrow batches
(no per-row Python), and the output schema is fixed up front so downstream
stages stay columnar. The actual codec work is STUBBED — image/audio
libraries are not in this container — behind ``decode_image_stub`` /
``NotImplementedError``; everything Spark-side (schema, batching, UDF
signature, partitioning) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, feat_hash string, "
    "width int, height int"
)


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB: deterministic fake of an image decode. A real deployment plugs
    in PIL/libvips here; the container has neither, so dimensions are derived
    from the payload hash (keeps every test deterministic and
    oracle-checkable)."""
    h = int(hashlib.md5(payload).hexdigest()[:4], 16)
    return 64 + h % 64, 64 + (h >> 6) % 64


def decode_image_real(payload: bytes):  # pragma: no cover - documented stub
    raise NotImplementedError(
        "real image decoding requires PIL/libvips (not in this container); "
        "use decode_image_stub for the deterministic fake"
    )


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary media column (here: the UTF-8 bytes of
    the text column standing in for an encoded image)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_type", F.lit("image/fake")
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary column. The pandas
    iterator form processes whole record batches per partition — the shape a
    real decoder needs (batch in, batch out, bounded memory)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            dims = payloads.map(
                lambda b: (
                    int(_hashlib.md5(bytes(b)).hexdigest()[:4], 16)
                    if b is not None
                    else None
                )
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else None),
                    "feat_hash": payloads.map(
                        lambda b: _hashlib.md5(bytes(b)).hexdigest()
                        if b is not None
                        else None
                    ),
                    "width": dims.map(lambda h: 64 + h % 64 if h is not None else None),
                    "height": dims.map(
                        lambda h: 64 + (h >> 6) % 64 if h is not None else None
                    ),
                }
            )

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_ts_ms int, frame_hash string"
FRAME_INTERVAL_MS = 40  # 25 fps stand-in


def frame_sample(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Video frame sampling over the opaque payload: one input row expands
    to N output rows (frames) inside the Arrow batch — the batch-shape
    change a real ffmpeg/pyav sampler needs. The decode is the deterministic
    stub: frame count = 1 + n_bytes % 4, frame hash = md5(payload ':' idx),
    timestamps on a fixed 40 ms cadence."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        for pdf in batches:
            ids, idxs, tss, hashes = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                n_frames = 1 + len(raw) % 4
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * FRAME_INTERVAL_MS)
                    hashes.append(
                        _hashlib.md5(raw + b":" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_ts_ms": pd.array(tss, dtype="int32"),
                    "frame_hash": hashes,
                }
            )

    return df.mapInPandas(_sample, schema=FRAME_SCHEMA)
