"""Multimodal binary-column plumbing: opaque payload bytes + typed metadata.

A 100 TB training-data table carries image/audio/video as ``binary`` columns.
The real decode libraries (PIL/ffmpeg) are not in this container, so the
decode step is a deterministic fake behind ``decode_image`` (clearly marked);
everything Spark-side — schema, Arrow batching via ``mapInPandas``, feature
extraction shape, partitioning — is real and tested.

The reference's analog is its embedded-image byte handling
(``PyMuPDF/pdf_image_extractor.py:143-166`` extract_image → bytes + ext;
md5 naming ``pdfplumber/smart_pdf_extractor.py:161``).
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_FEATURE_SCHEMA", "as_media_table", "media_features", "decode_image"]

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("content_md5", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
    ]
)

_REAL_DECODERS_AVAILABLE = False  # PIL/ffmpeg not in this container


def decode_image(data: bytes) -> "np.ndarray":
    """Decode image bytes to an HxWx3 uint8 array.

    STUB: real decoding needs PIL/libjpeg, absent here. The deterministic
    fake derives (w, h) from the byte length and fills pixels from the bytes
    themselves, so every downstream feature is reproducible and testable.
    Swap in ``PIL.Image.open`` when the library is present.
    """
    if _REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire PIL.Image.open(BytesIO(data)) here")
    n = max(1, len(data))
    w = 16 + (n % 48)
    h = 16 + ((n // 7) % 48)
    px = np.frombuffer(data, dtype=np.uint8)
    reps = (w * h * 3 + max(1, px.size) - 1) // max(1, px.size)
    arr = np.tile(px if px.size else np.zeros(1, np.uint8), reps)[: w * h * 3]
    return arr.reshape(h, w, 3)


def as_media_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Project a documents table into (media_id, payload binary) — the opaque
    binary-column shape; encode stays JVM-side."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def media_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    One ``mapInPandas`` crossing; the per-element numpy work stays inside the
    batch. Cheap scalar features (n_bytes, md5) intentionally ALSO exist as
    JVM expressions (F.octet_length / F.md5) — the oracle checks the
    Python-kernel output against the SQL-predicted values, proving the
    plumbing is faithful.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(data) if data is not None else b""
                arr = decode_image(b)
                out.append(
                    (
                        int(mid),
                        len(b),
                        hashlib.md5(b).hexdigest(),
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                        round(float(arr.mean()), 6),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in MEDIA_FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(kernel, schema=MEDIA_FEATURE_SCHEMA)
