"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real Spark-side machinery (schema, Arrow batching, partition behavior) with
the codec layer STUBBED: image/audio decode libraries are not available in
this environment, so `_decode_payload` raises NotImplementedError and the
pipeline falls back to a deterministic fake feature vector derived from the
payload bytes (sha256-seeded). Swapping in a real codec is a one-function
change; everything around it (batch shape, schema, error accounting) is
production-shaped and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("decode_status", T.StringType()),  # ok | stubbed | error
        T.StructField("feature", T.ArrayType(T.FloatType())),  # 8-dim
    ]
)

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "riff",
    b"<!DO": "html",
    b"<htm": "html",
}


def sniff_format(b: bytes) -> str:
    for magic, name in _MAGIC.items():
        if b[: len(magic)] == magic:
            return name
    return "unknown"


def _decode_payload(b: bytes) -> list[float]:
    """REAL decode would go here (PIL/libav/...). Not available offline."""
    raise NotImplementedError("codec libraries not present in this environment")


def fake_features(b: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in: sha256-derived pseudo-embedding in [0, 1)."""
    h = hashlib.sha256(b).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def decode_features(df: DataFrame, payload_col: str = "html") -> DataFrame:
    """mapInPandas decode/feature-extract stage (D1-shaped)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, nb, fmt, status, feat = [], [], [], [], []
            for url, b in zip(pdf["url"], pdf[payload_col]):
                b = bytes(b) if b is not None else b""
                urls.append(url)
                nb.append(len(b))
                fmt.append(sniff_format(b))
                try:
                    feat.append(_decode_payload(b))
                    status.append("ok")
                except NotImplementedError:
                    feat.append(fake_features(b))
                    status.append("stubbed")
                except Exception:
                    feat.append([0.0] * 8)
                    status.append("error")
            yield pd.DataFrame(
                {"url": urls, "n_bytes": pd.array(nb, dtype="int64"),
                 "format": fmt, "decode_status": status, "feature": feat}
            )

    return df.mapInPandas(fn, schema=DECODE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def frame_sample(df: DataFrame, payload_col: str = "html",
                 frame_bytes: int = 65536, stride: int = 4,
                 max_frames: int = 8) -> DataFrame:
    """Audio/video-style frame sampling over an opaque binary column:
    every `stride`-th window of `frame_bytes`, up to `max_frames` per row.
    Real decoders (libav frame extraction, audio resample) would replace the
    sha fingerprint; the batching/explosion plumbing is the production shape.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, idxs, offs, sizes, shas = [], [], [], [], []
            for url, b in zip(pdf["url"], pdf[payload_col]):
                b = bytes(b) if b is not None else b""
                fi = 0
                for k in range(0, max_frames):
                    off = k * stride * frame_bytes
                    if off >= len(b):
                        break
                    chunk = b[off : off + frame_bytes]
                    urls.append(url)
                    idxs.append(fi)
                    offs.append(off)
                    sizes.append(len(chunk))
                    shas.append(hashlib.sha256(chunk).hexdigest()[:16])
                    fi += 1
            yield pd.DataFrame(
                {
                    "url": urls,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "offset": pd.array(offs, dtype="int64"),
                    "n_bytes": pd.array(sizes, dtype="int32"),
                    "frame_sha": shas,
                }
            )

    return df.mapInPandas(fn, schema=FRAME_SCHEMA)
