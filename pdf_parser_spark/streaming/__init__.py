"""Streaming surface.

The reference has NO streaming operators (SURVEY.md §2.11 — it is a
synchronous request/response Flask service, ``pdf_api/app.py:67-69``), and
the north_rule mandates *batch* with checkpoint resume, which lineage.py
implements. This module provides the one idiomatic streaming extension:
incremental extraction of newly-arrived transcript files with
``Trigger.AvailableNow`` over the exact same kernel — useful when the
transcripts table is continuously appended.
"""
from __future__ import annotations

from pyspark.sql import SparkSession

from ..config import DEFAULT_CONFIG, ExtractConfig
from ..pipeline import TRANSCRIPT_SPARK_SCHEMA, extract_turns


def incremental_extraction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: ExtractConfig = DEFAULT_CONFIG,
):
    """readStream → same extraction kernel → parquet sink, available-now.

    Exactly-once via the streaming checkpoint; per-turn extraction is
    stateless so no watermark/state store is needed. Returns the started
    query; callers use ``q.awaitTermination()`` (available-now terminates
    after draining the backlog).
    """
    stream = (
        spark.readStream.schema(TRANSCRIPT_SPARK_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    extracted = extract_turns(stream, cfg, salt=False)
    return (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
