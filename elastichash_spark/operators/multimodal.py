"""Multimodal column plumbing: opaque binary payloads + typed metadata.

This is the transposition of the reference's image pathway — PIL
decode/resize/center-crop feeding a remote feature extractor
(``/root/reference/dh/app/util.py:44-133,172-219``) — generalized to any
binary modality. The Spark-side plumbing is real and tested (schema, Arrow
batch shape, partitioning, iterator-UDF signatures); the codec step itself is
STUBBED because image/audio libraries are not available in this environment:
``decode_features`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic md5-derived feature vector stands in for a real decoder,
keeping every downstream operator (ANN, dedup) exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),    # opaque bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: md5-expanded floats in
    [-1, 1), derived from the payload's uppercase hex (so any engine —
    Python, Spark, DuckDB — reproduces it from the same bytes). Replace with
    a real image/audio featurizer where available."""
    hexp = payload.hex().upper()
    out = np.empty(dim, dtype=np.float64)
    for i in range(dim):
        h = hashlib.md5(f"{hexp}:{i}".encode()).hexdigest()
        out[i] = (int(h[:16], 16) / float(1 << 64)) * 2.0 - 1.0
    return out


def decode_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """(media_id, modality, features array<float>) via mapInPandas.

    The Arrow batch path (iterator form, one batch in -> one batch out) is the
    production shape for a real decoder: payload bytes never touch the driver,
    batches stream through the Python worker, and the output schema is fixed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires image/audio libs not present "
                    "in this environment; pass fake=True for the deterministic stub"
                )
            feats = [
                _fake_features(bytes(p)).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "features": feats,
                }
            )

    return media.mapInPandas(
        run, "media_id long, modality string, features array<double>"
    )


def frame_sample(media: DataFrame, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """Explode video payloads into frame rows (media_id, frame_idx, frame_ts_ms,
    frame_payload) — a UDTF-shaped mapInPandas (rows out > rows in).

    The stub derives frame count from duration_ms and slices payload bytes
    deterministically; a real implementation would demux with pyav/ffmpeg.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("video demuxing stub; pass fake=True")
            pdf = pdf[pdf["payload"].notna() & pdf["duration_ms"].notna()]
            if not len(pdf):
                continue
            # vectorized offset arithmetic (no per-row Python): one frame
            # count per video, then one flat gather of (row, frame) pairs —
            # the production shape a real demuxer drops into (frame byte
            # ranges come from the container index the same way)
            n = np.maximum(1, pdf["duration_ms"].to_numpy().astype(np.int64) // every_ms)
            row_idx = np.repeat(np.arange(len(pdf), dtype=np.int64), n)
            starts = np.concatenate([[0], np.cumsum(n)[:-1]])
            frame_idx = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(starts, n)
            payloads = [bytes(p) for p in pdf["payload"]]
            plen = np.array([len(p) for p in payloads], dtype=np.int64)
            plen_r, n_r = plen[row_idx], n[row_idx]
            lo = (frame_idx * plen_r) // n_r
            hi = ((frame_idx + 1) * plen_r) // n_r
            media_ids = pdf["media_id"].to_numpy()[row_idx]
            yield pd.DataFrame(
                {
                    "media_id": media_ids,
                    "frame_idx": frame_idx.astype(np.int32),
                    "frame_ts_ms": (frame_idx * every_ms).astype(np.int32),
                    "frame_payload": [
                        payloads[r][a:b] for r, a, b in zip(row_idx, lo, hi)
                    ],
                }
            )

    return media.where(F.col("modality") == "video").mapInPandas(
        run, "media_id long, frame_idx int, frame_ts_ms int, frame_payload binary"
    )
