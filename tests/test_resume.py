"""Lineage + idempotent resume (S11/J4; BASELINE.json:14).

Simulates a crash-after-partial-commit: first run processes only a subset of
buckets (we pre-commit fake lineage for the rest... inverse: we run the job
normally, then delete some lineage rows and some output partitions, re-run,
and require byte-equal final state with no duplicated turns).
"""
from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from pdf_parser_spark.lineage import committed_buckets, run_job, with_bucket


@pytest.fixture()
def dirs(tmp_path):
    return {
        "out": str(tmp_path / "out"),
        "lineage": str(tmp_path / "lineage"),
    }


def test_full_run_then_noop_rerun(spark, transcripts_parquet, dirs):
    r1 = run_job(
        spark, transcripts_parquet, dirs["out"], dirs["lineage"],
        snapshot_id="snap1", run_id="run1", n_buckets=8, num_partitions=4,
    )
    n1 = spark.read.parquet(dirs["out"]).count()
    assert r1["turns"] == n1

    # re-run: anti-join must skip everything; output unchanged
    r2 = run_job(
        spark, transcripts_parquet, dirs["out"], dirs["lineage"],
        snapshot_id="snap1", run_id="run2", n_buckets=8, num_partitions=4,
    )
    assert r2["turns"] == r1["turns"]
    assert r2["buckets_committed"] == r1["buckets_committed"]
    out = spark.read.parquet(dirs["out"])
    assert out.count() == n1
    # no duplicated (conv_id, turn_idx)
    assert out.select("conv_id", "turn_idx").distinct().count() == n1


def test_resume_after_partial_commit(spark, transcripts_parquet, dirs):
    run_job(
        spark, transcripts_parquet, dirs["out"], dirs["lineage"],
        snapshot_id="snapA", run_id="run1", n_buckets=8, num_partitions=4,
    )
    full = (
        spark.read.parquet(dirs["out"])
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "payload_kind", "extracted_text", "turn_seq")
        .toPandas()
    )

    # simulate the crash: drop lineage rows for half the buckets and delete
    # one of those buckets' data (a torn write)
    lin = spark.read.parquet(dirs["lineage"]).toPandas()
    keep_buckets = sorted(lin["bucket"].unique())[: len(lin) // 2]
    shutil.rmtree(dirs["lineage"])
    spark.createDataFrame(lin[lin["bucket"].isin(keep_buckets)]).write.parquet(
        dirs["lineage"]
    )
    lost = [b for b in lin["bucket"].unique() if b not in keep_buckets]
    torn = lost[0]
    for f in glob.glob(os.path.join(dirs["out"], f"bucket={torn}", "*")):
        os.remove(f)

    r = run_job(
        spark, transcripts_parquet, dirs["out"], dirs["lineage"],
        snapshot_id="snapA", run_id="run2", n_buckets=8, num_partitions=4,
    )
    after = (
        spark.read.parquet(dirs["out"])
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "payload_kind", "extracted_text", "turn_seq")
        .toPandas()
    )
    assert after.equals(full)  # byte-equal final table
    assert r["buckets_committed"] == lin["bucket"].nunique()

    # committed-bucket accounting matches the data
    done = committed_buckets(spark, dirs["lineage"], "snapA").count()
    assert done == lin["bucket"].nunique()


def test_failure_counts_in_lineage(spark, transcripts_parquet, dirs):
    run_job(
        spark, transcripts_parquet, dirs["out"], dirs["lineage"],
        snapshot_id="snapF", run_id="run1", n_buckets=8, num_partitions=4,
    )
    lin = spark.read.parquet(dirs["lineage"])
    total_failures = lin.agg(F.sum("extraction_failure_count")).collect()[0][0]
    actual_errors = (
        spark.read.parquet(dirs["out"]).filter(~F.col("extraction_ok")).count()
    )
    assert total_failures == actual_errors
    # partition_hash is deterministic per (snapshot, bucket)
    assert lin.select("partition_hash").distinct().count() == lin.count()


def test_cluster_by_bucket_plan(spark, transcripts_parquet):
    """The write path's reassembly must plan ONE exchange
    (hashpartitioning on bucket), no persist, and only a partition-local
    sort for the window — the bucket-aligned shape that reuses the output
    layout's exchange and never materializes the extracted corpus (the
    range shape persists it in full just to feed the boundary sampler —
    bench-scale parity, production-scale storage win)."""
    from pdf_parser_spark.lineage import cluster_by_bucket
    from pdf_parser_spark.pipeline import extract_turns

    spark.catalog.clearCache()
    out = cluster_by_bucket(
        extract_turns(spark.read.parquet(transcripts_parquet)), 8, 4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchange = sum(
        1 for l in plan.splitlines() if l.strip().startswith(("(", "+", ":"))
        and "Exchange" in l
    )
    assert n_exchange == 1, plan
    assert "hashpartitioning(bucket" in plan, plan
    assert "InMemoryTableScan" not in plan, plan


def test_cluster_by_bucket_turn_seq_matches_reassemble(spark, transcripts_parquet):
    """Row-for-row turn_seq equality with the standalone range-shape
    reassembly: partitioning the window by (bucket, conv_id) is
    semantically identical to conv_id alone (bucket is a pure function of
    conv_id)."""
    from pdf_parser_spark.lineage import cluster_by_bucket
    from pdf_parser_spark.pipeline import extract_turns, reassemble

    spark.catalog.clearCache()
    raw = spark.read.parquet(transcripts_parquet)
    a = {
        (r["conv_id"], r["turn_idx"]): r["turn_seq"]
        for r in cluster_by_bucket(extract_turns(raw), 8, 4)
        .select("conv_id", "turn_idx", "turn_seq")
        .collect()
    }
    b = {
        (r["conv_id"], r["turn_idx"]): r["turn_seq"]
        for r in reassemble(extract_turns(raw), 4)
        .select("conv_id", "turn_idx", "turn_seq")
        .collect()
    }
    assert a == b and len(a) == 500
    spark.catalog.clearCache()
