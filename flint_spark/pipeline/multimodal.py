"""Multimodal columns: opaque binary payloads + typed metadata.

Design per SURVEY §7.0: image/audio/video travel as ``binary`` columns
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas stages over ``mapInPandas``.
The container has no image/audio libraries, so the *decode* step is
stubbed (clearly marked) behind ``NotImplementedError`` with a
deterministic fake-feature fallback — but the Spark-side plumbing
(schema, batch shape, partitioning, UDF signatures) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .hashing import h28

#: typed metadata carried next to every binary payload
MEDIA_META_TYPE = T.StructType([
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo ingestion: treat each document's utf-8 bytes as an opaque
    media payload with deterministic fake dimensions derived from its
    content hash (stands in for real image bytes + header parse)."""
    h = h28(F.col(text_col))
    meta = F.struct(
        F.lit("fake/raw").alias("format"),
        (F.pmod(h, F.lit(1024)) + 64).cast("int").alias("width"),
        (F.pmod(F.floor(h / 1024).cast("long"), F.lit(1024)) + 64).cast("int").alias("height"),
        (F.pmod(h, F.lit(16)) + 1).cast("int").alias("n_frames"),
    )
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8")) \
               .withColumn("media_meta", meta)


def _pil():
    """Guarded optional import: Pillow if installed, else None."""
    try:
        from PIL import Image  # noqa: PLC0415
        return Image
    except ImportError:
        return None


#: True when a real imaging library is available in this environment
HAS_PIXEL_DECODE = _pil() is not None


def decode_image(payload: bytes):
    """Decode image bytes to an HxWx[C] numpy array via Pillow when the
    library is installed; otherwise raise — the container this engine is
    developed in has no imaging library, and every caller falls back to
    deterministic byte-level features (clearly-marked stub path)."""
    Image = _pil()
    if Image is None:  # pragma: no cover - exercised only without Pillow
        raise NotImplementedError(
            "image decode requires an imaging library (e.g. Pillow); "
            "not available in this environment")
    import io

    import numpy as np
    return np.asarray(Image.open(io.BytesIO(payload)))


PIXEL_FEATURE_FIELDS = [
    T.StructField("px_width", T.IntegerType()),
    T.StructField("px_height", T.IntegerType()),
    T.StructField("px_mean", T.DoubleType()),
    T.StructField("px_std", T.DoubleType()),
]


def extract_pixel_features(df: DataFrame, payload_col: str = "payload",
                           id_col: str = "doc_id") -> DataFrame:
    """REAL pixel statistics per payload (requires Pillow —
    ``HAS_PIXEL_DECODE``): mapInPandas batches decode each image and
    emit (width, height, mean, std) over pixel values. Same plumbing
    shape as ``extract_features``; raises NotImplementedError up front
    when no imaging library is present rather than per-task."""
    if not HAS_PIXEL_DECODE:
        raise NotImplementedError(
            "extract_pixel_features requires an imaging library (Pillow)")
    import numpy as np

    schema = T.StructType([df.schema[id_col]] + PIXEL_FEATURE_FIELDS)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, ms, ss = [], [], [], []
            for payload in pdf[payload_col]:
                a = decode_image(bytes(payload)).astype(np.float64)
                hs.append(int(a.shape[0]))
                ws.append(int(a.shape[1]) if a.ndim > 1 else 1)
                ms.append(float(a.mean()))
                ss.append(float(a.std()))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "px_width": pd.Series(ws, dtype="int32"),
                "px_height": pd.Series(hs, dtype="int32"),
                "px_mean": ms, "px_std": ss})

    return df.select(id_col, payload_col).mapInPandas(feats, schema)


FEATURE_FIELDS = [
    T.StructField("byte_len", T.LongType()),
    T.StructField("byte_sum", T.LongType()),
    T.StructField("first_byte", T.IntegerType()),
    T.StructField("aspect_ratio", T.DoubleType()),
]


def extract_features(df: DataFrame, payload_col: str = "payload",
                     meta_col: str = "media_meta",
                     id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real pipeline shape: mapInPandas over (id, payload, meta) batches;
    per-batch vectorized work in pandas; output one feature row per
    payload. The pixel-level decode is stubbed (see ``decode_image``);
    byte-level features are real and deterministic.
    """
    schema = T.StructType(
        [df.schema[id_col]] + FEATURE_FIELDS)
    cols = [id_col, payload_col, meta_col]

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            meta = pdf[meta_col]
            out = pd.DataFrame({
                id_col: pdf[id_col],
                "byte_len": payloads.map(len).astype("int64"),
                "byte_sum": payloads.map(lambda b: int(sum(b))).astype("int64"),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                "aspect_ratio": meta.map(lambda m: m["width"] / m["height"]),
            })
            yield out

    return df.select(*cols).mapInPandas(feats, schema)


def sample_frames(df: DataFrame, every_n: int = 4,
                  meta_col: str = "media_meta", id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index
    (real videos would slice the payload; frame extraction is part of
    the stubbed decode)."""
    n_frames = F.col(f"{meta_col}.n_frames")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(F.col(id_col), F.explode(idx).alias("frame_idx"))


def resize_media(df: DataFrame, width: int, height: int,
                 payload_col: str = "payload", meta_col: str = "media_meta",
                 id_col: str = "doc_id") -> DataFrame:
    """Resize plumbing: mapInPandas over (id, payload, meta) batches,
    emitting a new payload + updated metadata struct.

    A real implementation decodes pixels (``decode_image`` stub) and
    resamples; here the deterministic stand-in stride-samples the
    payload bytes to ``width * height`` so batch shape, output schema
    (binary + struct) and per-batch vectorization are all real."""
    import numpy as np

    schema = T.StructType([df.schema[id_col],
                           T.StructField(payload_col, T.BinaryType()),
                           T.StructField(meta_col, MEDIA_META_TYPE)])
    target = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(b: bytes) -> bytes:
                if not len(b):
                    return b
                idx = np.linspace(0, len(b) - 1, num=min(target, len(b)),
                                  dtype=np.int64)
                return bytes(np.frombuffer(b, dtype=np.uint8)[idx])

            metas = pdf[meta_col].map(lambda m: {
                "format": m["format"], "width": width, "height": height,
                "n_frames": m["n_frames"]})
            yield pd.DataFrame({id_col: pdf[id_col],
                                payload_col: pdf[payload_col].map(one),
                                meta_col: metas})

    return df.select(id_col, payload_col, meta_col).mapInPandas(resize, schema)
