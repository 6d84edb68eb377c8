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


def decode_image(blob: bytes, decoder: str = "fake") -> np.ndarray:
    """Decode hook with a feature flag.

    decoder='real' wires PIL/torchvision on a cluster that has them (this
    container has none → NotImplementedError, by design). decoder='fake'
    is a DETERMINISTIC stand-in the brief allows: dimensions come from the
    first two bytes (8..15 each), pixels are the blob bytes tiled to W×H —
    so every downstream op (resize, stats, histograms) runs REAL numpy on
    real arrays and is reproducible + oracle-checkable (tiling preserves
    the byte mean/std exactly)."""
    if decoder == "real":  # pragma: no cover - scaffolding for real decoders
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "media decode requires an image library not present in this sandbox"
            ) from e
        raise NotImplementedError("wire PIL decode here on a real cluster")
    b = np.frombuffer(blob, dtype=np.uint8)
    if b.size == 0:
        return np.zeros((16, 8), dtype=np.uint8)
    # width varies with the content; height fixed at the blob length so the
    # tiling is EXACT (h*w is a multiple of len(b)) — pixel mean/std then
    # equal the byte mean/std, which keeps the decode oracle-checkable
    w = 8 + int(b[0]) % 8
    h = b.size
    return np.resize(b, (h, w))  # np.resize tiles the buffer


def resize_image(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy — the real-op part of the
    multimodal pipeline; swap for PIL resampling under decoder='real')."""
    h, w = px.shape
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[np.ix_(ys, xs)]


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("px_mean", T.DoubleType()),
        T.StructField("px_std", T.DoubleType()),
        T.StructField("thumb", T.ArrayType(T.IntegerType())),
    ]
)


def decode_media(media: DataFrame, *, decoder: str = "fake", thumb: int = 4) -> DataFrame:
    """Arrow-batched decode + feature-extract + resize: one mapInPandas
    stage, numpy inside; (doc_id, mime, width, height, px_mean, px_std,
    thumb) where thumb is the nearest-neighbor thumb×thumb downsample."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "mime", "width", "height",
                                    "px_mean", "px_std", "thumb")}
            for doc_id, mime, blob in zip(pdf["doc_id"], pdf["mime"], pdf["blob"]):
                px = decode_image(bytes(blob), decoder=decoder)
                rows["doc_id"].append(doc_id)
                rows["mime"].append(mime)
                rows["height"].append(px.shape[0])
                rows["width"].append(px.shape[1])
                fpx = px.astype(np.float64)
                # mean/std via exact integer sums (E[x²]−E[x]²) so the
                # DuckDB oracle's avg-based formula lands on the SAME double
                rows["px_mean"].append(float(fpx.mean()))
                rows["px_std"].append(
                    float(np.sqrt((fpx ** 2).mean() - fpx.mean() ** 2))
                )
                rows["thumb"].append(
                    resize_image(px, thumb, thumb).ravel().astype("int32").tolist()
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_rms", T.DoubleType()),
    ]
)


def frame_sample(media: DataFrame, *, frame_bytes: int = 4, every: int = 2) -> DataFrame:
    """Frame sampling for video/audio blobs: split the byte stream into
    frame_bytes-sized frames, keep every k-th, emit per-frame RMS — the
    frame-sample leg of the multimodal pipeline (one exploded row per
    sampled frame; partition-preserving mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, rms = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                b = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.float64)
                n = len(b) // frame_bytes
                frames = b[: n * frame_bytes].reshape(n, frame_bytes)
                for i in range(0, n, every):
                    ids.append(doc_id)
                    idxs.append(i)
                    rms.append(float(np.sqrt((frames[i] ** 2).mean())))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_rms": rms})

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


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
