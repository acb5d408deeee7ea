"""Structured Streaming surface: incremental extraction over newly-arrived
transcript files with Trigger.AvailableNow (pdf_parser_spark.streaming).

The reference has no streaming (SURVEY.md §2.11); this is the idiomatic
append-only extension over the identical kernel. The test checks
exactly-once across two incremental batches via the streaming checkpoint.
"""
from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from pdf_parser_spark.datagen import TRANSCRIPT_SCHEMA, generate_transcripts
from pdf_parser_spark.streaming import incremental_extraction


def _write_slice(df, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(df, schema=TRANSCRIPT_SCHEMA, preserve_index=False), path
    )


def test_incremental_extraction_exactly_once(spark, transcripts_pdf, tmp_path):
    work = str(tmp_path / "stream")
    in_dir, out_dir, ckpt = f"{work}/in", f"{work}/out", f"{work}/ckpt"

    first, second = transcripts_pdf.iloc[:300], transcripts_pdf.iloc[300:]
    _write_slice(first, f"{in_dir}/batch1.parquet")

    q = incremental_extraction(spark, in_dir, out_dir, ckpt)
    q.awaitTermination()
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == len(first)

    # new file arrives; available-now drains ONLY the backlog delta
    _write_slice(second, f"{in_dir}/batch2.parquet")
    q2 = incremental_extraction(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination()

    out = spark.read.parquet(out_dir)
    assert out.count() == len(transcripts_pdf)  # no reprocessing duplicates
    dup = out.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
    assert dup == 0
    kinds = {r["payload_kind"] for r in out.select("payload_kind").distinct().collect()}
    assert "plain" in kinds and "html" in kinds

    shutil.rmtree(work, ignore_errors=True)
