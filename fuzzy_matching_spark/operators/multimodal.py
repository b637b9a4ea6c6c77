"""Multimodal column plumbing: binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as opaque ``binary`` columns
with typed metadata structs; the Spark-side contract (schema, partitioning,
Arrow batch shape, UDF signatures) is real and tested here, while the codec
step itself is stubbed — the image/audio libraries are not in this
container, so ``decode_image``/``extract_audio_features`` either raise
``NotImplementedError`` (strict mode) or produce a deterministic fake
derived from the payload bytes (test mode), clearly marked.

Operators:

* :func:`with_media_metadata` — cheap JVM-side byte-level metadata
  (size, sha256, magic-number sniffing) — no Python.
* :func:`decode_image_features` — ``mapInPandas`` over binary batches ->
  fixed-width feature vectors; the real implementation would swap
  ``_stub_decode`` for PIL/torchvision inside the same batch loop.
* :func:`sample_video_frames` — frame-index plan (offsets) for a stride
  sampler; pure column arithmetic on metadata, no decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "with_media_metadata",
    "decode_image_features",
    "sample_video_frames",
    "MEDIA_MAGIC",
]

MEDIA_MAGIC = {
    "png": b"\x89PNG",
    "jpeg": b"\xff\xd8\xff",
    "gif": b"GIF8",
    "riff": b"RIFF",  # wav/avi containers
}


def with_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach (media_size, media_sha256, media_kind) — all JVM-side."""
    kind = F.lit("unknown")
    for name, magic in reversed(MEDIA_MAGIC.items()):
        hexpref = magic.hex()
        kind = F.when(
            F.hex(F.substring(F.col(payload_col), 1, len(magic))) == hexpref.upper(),
            F.lit(name),
        ).otherwise(kind)
    return (
        df.withColumn("media_size", F.length(F.col(payload_col)))
        .withColumn("media_sha256", F.sha2(F.col(payload_col), 256))
        .withColumn("media_kind", kind)
    )


def _stub_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decoded features': seeded by the payload digest.

    STUB — replace with a real codec (PIL / torchaudio) in an environment
    that has one; the batch shape and dtype contract stay identical.
    """
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 64,
    strict: bool = False,
) -> DataFrame:
    """Binary payloads -> fixed-width float feature vectors (Arrow batches).

    ``strict=True`` raises ``NotImplementedError`` (no codec in this
    container); ``strict=False`` uses the deterministic stub so the full
    pipeline — schema, shuffle, downstream ANN — can be exercised.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError(
                "image codec not available in this environment; "
                "run with strict=False for the deterministic stub"
            )
        for pdf in batches:
            feats = [_stub_decode(p, dim) for p in pdf[payload_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(
        decode, schema=f"`{id_col}` long, features array<float>"
    )


def sample_video_frames(
    df: DataFrame,
    n_frames_col: str = "n_frames",
    id_col: str = "media_id",
    stride: int = 30,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plan: (media_id, frame_index) rows, pure JVM arithmetic.

    The decode of the planned frames is the stubbed step; the plan itself
    (sequence + explode, bounded per row) is the part that must scale.
    """
    idx = F.sequence(
        F.lit(0),
        F.least(F.col(n_frames_col) - 1, F.lit(stride * (max_frames - 1))),
        F.lit(stride),
    )
    return df.select(id_col, F.explode(idx).alias("frame_index"))
