"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — binary columns, Arrow-batched
`mapInPandas` feature extraction, typed output schema, partition-preserving
flow. The actual media DECODE is stubbed (no PIL/ffmpeg in this container):
`decode_image` raises NotImplementedError when a real decoder is requested,
and the default path computes deterministic byte-level features (length,
first byte, byte sum) so the pipeline shape is testable end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("blob", T.BinaryType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("blob_len", T.IntegerType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("byte_sum", T.IntegerType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
    ]
)


def synth_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic opaque blobs: unhex(md5(text)) — 16 bytes each — with
    a mime column. Stands in for real crawled media bytes."""
    d = F.col(id_col).cast("long")
    mime = (
        F.when(d % 3 == 0, "image/png")
        .when(d % 3 == 1, "image/jpeg")
        .otherwise("audio/wav")
    )
    return docs.select(
        d.alias("doc_id"), mime.alias("mime"), F.unhex(F.md5(F.col(text_col))).alias("blob")
    )


def decode_image(blob: bytes):  # pragma: no cover - scaffolding for real decoders
    """Real decode hook. Wire PIL/torchvision here on a cluster with the
    libs installed; this container has none."""
    raise NotImplementedError("media decode requires an image library not present in this sandbox")


def media_features(media: DataFrame, *, batch_hint: int = 10_000) -> DataFrame:
    """Arrow-batched feature extraction over binary blobs (mapInPandas —
    one pandas frame per Arrow batch, vectorized numpy inside; no per-row
    Python function calls)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            lens = blobs.map(len).astype("int32")
            firsts = blobs.map(lambda b: b[0] if len(b) else 0).astype("int32")
            sums = blobs.map(lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())).astype(
                "int32"
            )
            feat = [
                np.array([ln, fb, sm / max(ln, 1)], dtype=np.float32)
                for ln, fb, sm in zip(lens, firsts, sums)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "blob_len": lens,
                    "first_byte": firsts,
                    "byte_sum": sums,
                    "feat": feat,
                }
            )

    return media.mapInPandas(extract, schema=FEATURES_SCHEMA)
