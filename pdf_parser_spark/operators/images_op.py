"""DataFrame operators for the reference's flagship raster outputs.

``image_records``  — the per-embedded-image pipeline of ``_extract_digital_pdf``
(S6 explode → F3 bounds → D4 NMS incl. F2 min-size → D1 md5 dedup → K2 crop
render of kept images), one row per image object with keep/drop provenance.
``page_renders``   — the vector/scanned whole-page render path (K1, K4 CAD).

Both are single mapInPandas crossings over the transcripts table: the heavy
payload column never survives the kernel (only md5s/dims/flags come back),
so downstream shuffles move tiny rows — the extract-first-shuffle-later rule
from SURVEY.md §7.3.
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..config import DEFAULT_CONFIG, ExtractConfig
from ..kernels.records import payload_image_records, payload_page_renders

__all__ = [
    "IMAGE_RECORD_SCHEMA",
    "PAGE_RENDER_SCHEMA",
    "ANALYSIS_SCHEMA",
    "image_records",
    "page_renders",
    "analysis_records",
]

IMAGE_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("img_idx", T.IntegerType(), False),
        T.StructField("x0", T.DoubleType(), False),
        T.StructField("y0", T.DoubleType(), False),
        T.StructField("x1", T.DoubleType(), False),
        T.StructField("y1", T.DoubleType(), False),
        T.StructField("px_w", T.IntegerType(), False),
        T.StructField("px_h", T.IntegerType(), False),
        T.StructField("content_md5", T.StringType(), False),
        T.StructField("size_bytes", T.IntegerType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("color_mode", T.StringType(), False),
        T.StructField("kept", T.BooleanType(), False),
        T.StructField("drop_reason", T.StringType(), False),
        T.StructField("crop_md5", T.StringType(), False),
    ]
)

PAGE_RENDER_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("renderer", T.StringType(), False),
        T.StructField("px_w", T.IntegerType(), False),
        T.StructField("px_h", T.IntegerType(), False),
        T.StructField("png_md5", T.StringType(), False),
        T.StructField("png_bytes", T.IntegerType(), False),
    ]
)

ANALYSIS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("page_count", T.IntegerType(), False),
        # the analyzer's nested pages_info[] — array of per-page stat structs
        # (``pdf_api/core/pdf_analyzer.py:92-103``)
        T.StructField(
            "pages_info",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("page", T.IntegerType(), False),
                        T.StructField("text_chars", T.IntegerType(), False),
                        T.StructField("image_count", T.IntegerType(), False),
                        T.StructField("curves", T.IntegerType(), False),
                        T.StructField("lines", T.IntegerType(), False),
                        T.StructField("rects", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
        T.StructField("total_text_chars", T.IntegerType(), False),
        T.StructField("total_images", T.IntegerType(), False),
        T.StructField("total_vectors", T.IntegerType(), False),
        T.StructField("pdf_type", T.StringType(), False),
        # /Info document metadata map (Title/Author/CreationDate),
        # insertion-ordered as written in the PDF
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), False),
    ]
)

_IR_COLS = [f.name for f in IMAGE_RECORD_SCHEMA.fields]
_PR_COLS = [f.name for f in PAGE_RENDER_SCHEMA.fields]
_AN_COLS = [f.name for f in ANALYSIS_SCHEMA.fields]


def _explode_kernel(payload_fn, out_cols):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"].astype(object)
            ):
                for rec in payload_fn(text if isinstance(text, str) else None):
                    rows.append(
                        {"conv_id": conv_id, "turn_idx": int(turn_idx), **rec}
                    )
            yield pd.DataFrame(rows, columns=out_cols)

    return kernel


def image_records(
    transcripts: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG, crop_dpi: int = 36
) -> DataFrame:
    # no pre-shuffle: scan splits are payload-size-uniform (16 MB splits,
    # session_defaults), so shuffling the heavy text column would cost more
    # than it balances; the tiny record rows shuffle freely downstream
    from .. import ship_package

    ship_package(transcripts.sparkSession)
    df = transcripts.select("conv_id", "turn_idx", "text")
    fn = lambda t: payload_image_records(t, cfg, crop_dpi)  # noqa: E731
    return df.mapInPandas(_explode_kernel(fn, _IR_COLS), schema=IMAGE_RECORD_SCHEMA)


def page_renders(
    transcripts: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG, dpi: int = 72
) -> DataFrame:
    from .. import ship_package

    ship_package(transcripts.sparkSession)
    df = transcripts.select("conv_id", "turn_idx", "text")
    fn = lambda t: payload_page_renders(t, cfg, dpi)  # noqa: E731
    return df.mapInPandas(_explode_kernel(fn, _PR_COLS), schema=PAGE_RENDER_SCHEMA)


def analysis_records(
    transcripts: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG
) -> DataFrame:
    """The analyzer envelope (``/api/analyze``) as a DataFrame: one row per
    PDF turn with the nested ArrayType(StructType) ``pages_info`` column."""
    from .. import ship_package
    from ..kernels.records import payload_analysis

    ship_package(transcripts.sparkSession)
    df = transcripts.select("conv_id", "turn_idx", "text")
    fn = lambda t: payload_analysis(t, cfg)  # noqa: E731
    return df.mapInPandas(_explode_kernel(fn, _AN_COLS), schema=ANALYSIS_SCHEMA)


RENDER_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("media_ord", T.IntegerType(), False),
        T.StructField("variant", T.StringType(), False),
        T.StructField("png", T.BinaryType(), False),
    ]
)

_RM_COLS = [f.name for f in RENDER_MEDIA_SCHEMA.fields]


def render_media(
    transcripts: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG, dpi: int = 72
) -> DataFrame:
    """Page renders as a binary media table (conv_id, turn_idx, page,
    media_ord, variant, png) — real PNG payloads for the pixel operators."""
    from .. import ship_package
    from ..kernels.records import payload_render_media

    ship_package(transcripts.sparkSession)
    df = transcripts.select("conv_id", "turn_idx", "text")
    fn = lambda t: payload_render_media(t, cfg, dpi)  # noqa: E731
    return df.mapInPandas(_explode_kernel(fn, _RM_COLS), schema=RENDER_MEDIA_SCHEMA)
