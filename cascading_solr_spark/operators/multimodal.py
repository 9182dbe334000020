"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this environment, so
the decode step is STUBBED (deterministic fake features clearly marked as
such / NotImplementedError for real decode) — but the Spark-side plumbing is
real and tested: binary columns, Arrow batch shape through mapInPandas,
metadata schema, and partition-friendly layout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, payload binary, media_type string, byte_len int"
)

FEATURE_SCHEMA = (
    "doc_id long, byte_len int, width int, height int, n_frames int, "
    "checksum long"
)


def as_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text column as an opaque binary payload with typed metadata —
    the shape a real image/audio column would have."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(payload).alias("byte_len"),
    )


def decode_media(payload: bytes) -> bytes:
    """Real decode is not available in this container (no image/audio libs)."""
    raise NotImplementedError(
        "media decode requires imaging/audio libraries not present in this "
        "environment; use extract_features (deterministic fake) for plumbing"
    )


def extract_features(media: DataFrame, batch_hint: int = 10_000) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The features are DETERMINISTIC FAKES derived from payload bytes (stand-ins
    for width/height/frame-count a real decoder would produce); the Arrow
    batch plumbing, schema, and vectorized byte handling are real.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            lens = pdf["payload"].map(len).to_numpy(dtype="int64")
            # cheap vectorized checksum: sum of bytes of each payload
            checksums = np.fromiter(
                (int(np.frombuffer(p, dtype=np.uint8).sum()) for p in pdf["payload"]),
                dtype="int64",
                count=len(pdf),
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": lens.astype("int32"),
                    "width": (lens % 640).astype("int32"),
                    "height": (lens % 480).astype("int32"),
                    "n_frames": (lens // 1024 + 1).astype("int32"),
                    "checksum": checksums,
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)
