"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as `binary` columns with a typed
metadata struct.  The Spark-side plumbing — schema, partition-friendly
layout, Arrow batch shapes, mapInPandas signatures — is real and tested;
the actual decode is STUBBED (`decode_stub='fake'` produces deterministic
md5-derived features; `decode_stub='error'` raises NotImplementedError)
because no image/audio codec libraries exist in this container.  Swapping
in a real decoder changes ONLY the `_decode_batch` body.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"

FEATURE_DIM = 8


def documents_as_media(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Adapter used in tests: wrap a text corpus as fake media rows so the
    binary-column plumbing can be exercised without real image data."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.length(text_col).cast("int").alias("width"),
            F.lit(1).alias("height"),
            F.lit(0).alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: FEATURE_DIM floats from
    the md5 of the payload (uniform in [0,1))."""
    h = hashlib.md5(payload or b"").digest()
    return np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype("float32") / 65536.0


def extract_features(media: DataFrame, decode_stub: str = "fake") -> DataFrame:
    """Decode/feature-extract over binary payloads via mapInPandas.

    Batch shape: Arrow record batches of (media_id, kind, payload); output
    one feature row per input row.  `decode_stub='error'` marks where a
    real codec plugs in.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if decode_stub == "error":
                raise NotImplementedError(
                    "real media decode requires codec libraries not present "
                    "in this environment; use decode_stub='fake'"
                )
            feats = [_fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled timestamp
    (decode stubbed — emits (media_id, frame_ts_ms) pairs from metadata)."""
    n_frames = F.greatest(
        F.lit(1), (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int")
    )
    return media.select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * F.lit(every_ms)
            )
        ).alias("frame_ts_ms"),
    )
