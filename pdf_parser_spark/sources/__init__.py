"""Sources: table readers for the engine.

The reference's "sources" are per-request file opens
(``pdf_api/api/routes.py:113-144`` multipart upload → temp file;
``pdfplumber.open``/``fitz.open``/``pdfium.PdfDocument`` per backend —
SURVEY.md §2.1 S1-S4). Here every source is a table scan: Catalyst gets
predicate pushdown + column pruning for free, and the binaryFile source
covers the raw-PDF-files-on-disk case.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..pipeline import TRANSCRIPT_SPARK_SCHEMA

TPCH_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """The primary input: transcripts parquet with the fixed schema.

    With an Iceberg catalog on the classpath this would be
    ``spark.read.table(name)`` + snapshot options; the sandbox substitutes
    parquet with the identical schema (SURVEY.md §1.3). Gated, not stubbed:
    """
    if path.startswith("iceberg:"):
        # Iceberg jars are not in this image; keep the call-shape documented.
        return spark.read.table(path[len("iceberg:"):])
    return spark.read.schema(TRANSCRIPT_SPARK_SCHEMA).parquet(path)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Driver-provided testdata table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_raw_pdf_files(spark: SparkSession, glob_path: str) -> DataFrame:
    """Raw .pdf files on disk → (path, modificationTime, length, content).

    The binaryFile analog of the reference's file-open sources (S1-S3);
    ``content`` is BinaryType and feeds the same kernels after a
    base64-encode-free branch.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(glob_path)
    )
