"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over ``mapInPandas``.  The actual codec work is
STUBBED (no image/audio libs in this container): ``decode_stub``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder produces stable pseudo-features — the
Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) is real and tested either way.

On a real cluster, replace ``_fake_decode`` with Pillow/torchaudio/
pyav calls; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_DDL = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)
FEATURES_DDL = "media_id bigint, kind string, feature array<float>, ok boolean"
FRAMES_DDL = "media_id bigint, frame_idx int, frame binary"


def synth_media(spark, docs: DataFrame, kind: str = "image") -> DataFrame:
    """Build a media table from documents: payload = utf-8 bytes of the
    text (an opaque stand-in), deterministic metadata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            (F.length("text") % 640 + 1).cast("int").alias("width"),
            (F.length("text") % 480 + 1).cast("int").alias("height"),
            (F.length("text") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic pseudo-decode: md5 of the payload expanded into a
    float feature vector in [0,1)."""
    h = hashlib.md5(bytes(payload)).digest()
    reps = (dim + len(h) - 1) // len(h)
    raw = (h * reps)[:dim]
    return np.frombuffer(bytes(raw), dtype=np.uint8).astype(np.float32) / 256.0


def decode_features(
    media: DataFrame, dim: int = 8, fake: bool = True
) -> DataFrame:
    """media -> (media_id, kind, feature, ok).  The real-library hook;
    stubbed with a deterministic fake decoder."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires Pillow/pyav; not shipped "
                    "in this container — pass fake=True or install codecs"
                )
            feats = [
                _fake_decode(p, dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "ok": [f is not None for f in feats],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, FEATURES_DDL
    )


def frame_sample(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Video-style frame sampling plumbing: slice the payload into
    pseudo-frames (real impl: pyav keyframe iterator).  One output row
    per sampled frame — the explode-shaped schema a real sampler needs."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    continue
                b = bytes(p)
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.select("media_id", "payload").mapInPandas(kernel, FRAMES_DDL)
