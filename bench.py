#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "turns_per_sec": ...}

Env:
    SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     local[] parallelism (default 32)
    BENCH_MULT           transcript volume multiplier (default 16; the
                         extraction corpus is BENCH_MULT x documents rows)

Each query is materialized with a noop write so every output column is
computed (a bare count() would let Catalyst prune the expensive ones).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MULT = int(os.environ.get("BENCH_MULT", "16"))

# the headline suite: flagship extraction + the operators that dominate a
# training-data pipeline at scale (dedup, similarity, text stats, NMS, joins)
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "a2_first3_totals",
    "w3_first_occurrence",
    "d1_exact_dedup",
    "minhash_lsh_pairs",
    "simhash_digests",
    "fingerprint48",
    "token_stats",
    "lang_id_histogram",
    "cosine_topk",
    "srp_bucket_histogram",
    "d4_nms_filter",
    "media_features",
    "fallback_extraction",
    "simhash_hamming_pairs",
    "embedding_near_dup",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    from pdf_parser_spark.caching import release_persisted

    from pdf_parser_spark import golden as G
    from pdf_parser_spark.datagen import generate_transcripts_multi
    from pdf_parser_spark.pipeline import run_extraction, session_defaults

    spark = (
        session_defaults(
            SparkSession.builder.master(f"local[{CPUS}]").appName("bench"), cpus=CPUS
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    def run(name, df_factory):
        # best-of-3: this host's available CPU swings ~2x on a minutes
        # timescale (see BENCH/BASELINE.md controls); the min is the
        # capability, a single draw is a lottery ticket — and two
        # consecutive draws were observed landing in the same stall (a
        # 0.5s query measured 14s twice back-to-back)
        best = None
        for _ in range(3):
            df = df_factory()
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            sec = time.time() - t0
            spark.catalog.clearCache()  # drop operator persists between runs
            release_persisted()
            best = sec if best is None else min(best, sec)
        timings[name] = round(best, 3)

    # flagship: extraction throughput over MULT x the sf documents
    tpath = os.path.join(
        G.CACHE_DIR, f"transcripts_{G.sf_tag(SF_DIR)}_x{MULT}.parquet"
    )
    if not os.path.exists(tpath):
        generate_transcripts_multi(SF_DIR, tpath, mult=MULT)
    import pyarrow.parquet as pq

    n_turns = pq.read_metadata(tpath).num_rows
    # warm-up on the small smoke corpus: JIT + codegen + python-worker spawn
    # are session costs, not pipeline throughput
    run_extraction(spark, G.ensure_transcripts("/root/testdata/sf0.001")).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.catalog.clearCache()
    run(
        "extract_pipeline",
        lambda: run_extraction(spark, tpath, num_partitions=CPUS),
    )
    extract_sec = timings["extract_pipeline"]

    qs = entrymod.queries()
    for name in HEADLINE:
        run(name, lambda name=name: qs[name](spark, SF_DIR))

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (extraction + operator queries)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "turns": n_turns,
                "turns_per_sec": round(n_turns / extract_sec, 1),
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
