"""Bucketed-table writes for co-located (shuffle-free) joins.

At 100 TB the dominant repeated cost of a join-heavy workload is
re-shuffling the fact table on the same key for every query. Bucketing
pays that shuffle ONCE at write time: both sides of a join bucketed by the
join key into the same bucket count are co-located by construction, so the
join plan has ZERO Exchange operators (pinned by
tests/test_plan_shapes.py::test_bucketed_join_is_shuffle_free) — each task
joins bucket i of A against bucket i of B. ``sort_by`` additionally
pre-orders rows inside each bucket file so the SortMergeJoin's per-task
sort is skipped too.

This is the standard Iceberg/Hive layout decision for the 10^12-turn
transcripts table (bucket by conv_id): extraction results, per-turn
features, and dedup verdicts all join back on the same key without a
shuffle.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
    sort_by: str | None = None,
) -> None:
    """Write ``df`` as an external bucketed table (parquet at ``path``).

    Both sides of an intended co-located join must use the SAME
    ``bucket_col`` semantics and ``n_buckets`` — Spark only elides the
    exchange when the output partitionings match exactly.
    """
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_by is not None:
        w = w.sortBy(sort_by)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table WITH its bucket spec (``spark.table`` — a bare
    ``read.parquet`` of the same files would lose the bucketing metadata
    and reintroduce the shuffle)."""
    return spark.table(table_name)
