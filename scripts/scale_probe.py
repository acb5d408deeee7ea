#!/usr/bin/env python
"""Diagnostic: which stage limits local[8] -> local[32] scaling?

Runs, in fresh JVMs back-to-back (one host window), at each level:
  extract   — salt repartition + mapInPandas kernel only (noop sink)
  full      — + repartitionByRange + window reassembly (the bench job)
Usage: python scripts/scale_probe.py [--worker MODE CPUS]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(os.environ.get("SCALE_MULT", "64"))
LEVELS = tuple(int(x) for x in os.environ.get("PROBE_LEVELS", "8,32").split(","))
MODES = os.environ.get("PROBE_MODES", "extract,full").split(",")
TRIALS = int(os.environ.get("PROBE_TRIALS", "2"))


def input_path() -> str:
    from pdf_parser_spark import golden as G

    return os.path.join(G.CACHE_DIR, f"transcripts_{G.sf_tag(SF_DIR)}_x{MULT}.parquet")


def worker(mode: str, cpus: int) -> None:
    from pyspark.sql import SparkSession

    from pdf_parser_spark import golden as G
    from pdf_parser_spark.pipeline import (
        extract_turns,
        reassemble,
        run_extraction,
        session_defaults,
    )

    spark = (
        session_defaults(
            SparkSession.builder.master(f"local[{cpus}]").appName(f"probe{cpus}"),
            cpus=cpus,
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def job(path):
        df = spark.read.parquet(path)
        if mode == "extract":
            return extract_turns(df)
        return reassemble(extract_turns(df), num_partitions=cpus)

    job(G.ensure_transcripts("/root/testdata/sf0.001")).write.format("noop").mode(
        "overwrite"
    ).save()  # warm-up
    spark.catalog.clearCache()
    t0 = time.time()
    job(input_path()).write.format("noop").mode("overwrite").save()
    print(json.dumps({"mode": mode, "cpus": cpus, "sec": round(time.time() - t0, 3)}))
    spark.stop()


def main() -> None:
    from pdf_parser_spark.datagen import generate_transcripts_multi

    if not os.path.exists(input_path()):
        generate_transcripts_multi(SF_DIR, input_path(), mult=MULT)

    def run(mode, cpus):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", mode, str(cpus)],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)["sec"]

    for t in range(TRIALS):
        res = {}
        for mode in MODES:
            levels = LEVELS if t % 2 == 0 else tuple(reversed(LEVELS))
            for cpus in levels:
                res[(mode, cpus)] = run(mode, cpus)
        line = {f"{m}@{c}": s for (m, c), s in res.items()}
        for mode in MODES:
            a, b = min(LEVELS), max(LEVELS)
            line[f"{mode}_eff"] = round(
                (res[(mode, a)] / res[(mode, b)]) / (b / a), 3
            )
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[1] == "--worker":
        worker(sys.argv[2], int(sys.argv[3]))
    else:
        main()
