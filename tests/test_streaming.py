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


def test_stateful_conversation_progress(spark, transcripts_pdf, tmp_path):
    """applyInPandasWithState: per-conversation cumulative rollup whose
    state survives across two AvailableNow runs via the checkpoint — a
    conversation split across the two input batches must report CUMULATIVE
    counts in its second-run row."""
    from pyspark.sql import functions as F

    from pdf_parser_spark.pipeline import TRANSCRIPT_SPARK_SCHEMA, extract_turns
    from pdf_parser_spark.streaming.stateful import conversation_progress

    work = str(tmp_path / "state_stream")
    in_dir, out_dir, ckpt = f"{work}/in", f"{work}/out", f"{work}/ckpt"

    first, second = transcripts_pdf.iloc[:300], transcripts_pdf.iloc[300:]
    _write_slice(first, f"{in_dir}/batch1.parquet")

    def run_once():
        stream = (
            spark.readStream.schema(TRANSCRIPT_SPARK_SCHEMA)
            .option("maxFilesPerTrigger", 64)
            .parquet(in_dir)
        )
        progress = conversation_progress(extract_turns(stream, salt=False))

        def sink(batch_df, batch_id):
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(out_dir)

        q = (
            progress.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    _write_slice(second, f"{in_dir}/batch2.parquet")
    run_once()

    out = spark.read.parquet(out_dir).toPandas()
    # latest row per conversation = cumulative truth vs the batch input
    latest = (
        out.sort_values("batch_id").groupby("conv_id").last().reset_index()
    )
    want = (
        transcripts_pdf.groupby("conv_id")
        .agg(n_turns=("turn_idx", "size"), max_turn_idx=("turn_idx", "max"))
        .reset_index()
    )
    merged = latest.merge(want, on="conv_id", suffixes=("", "_want"))
    assert len(merged) == len(want)
    assert (merged["n_turns"] == merged["n_turns_want"]).all()
    assert (merged["max_turn_idx"] == merged["max_turn_idx_want"]).all()
    # at least one conversation genuinely spanned both runs (state carried)
    both = set(first["conv_id"]) & set(second["conv_id"])
    assert both
    import shutil

    shutil.rmtree(work, ignore_errors=True)
