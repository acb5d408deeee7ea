#!/usr/bin/env python
"""The N -> 4N simulation the mandate actually describes: 4N cores as FOUR
separate executor processes (4 x local[8], each pinned to its own 8 cores,
each owning a quarter of the corpus) versus ONE local[8] over the full
corpus.

A real cluster at 4N executors is multiple JVMs with disjoint CPU budgets —
not one 32-thread JVM whose ~70 hot threads (tasks + python workers + GC +
shuffle) oversubscribe a single host. local[32] measures that artifact;
this harness removes it while keeping everything else identical (same
plan, same kernel, same per-executor thread shape).

Efficiency = T_one_executor(full) / (4 * max_i T_executor_i(quarter)).

Usage:
    python scripts/multi_executor_bench.py            # orchestrate
    python scripts/multi_executor_bench.py --worker CPUS INPUT
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
MULT = int(os.environ.get("SCALE_MULT_WIDE", "256"))
TRIALS = int(os.environ.get("ME_TRIALS", "3"))


def chunks_dir() -> str:
    from pdf_parser_spark import golden as G

    return os.path.join(
        G.CACHE_DIR, f"transcripts_{G.sf_tag(SF_DIR)}_x{MULT}.parquet.chunks"
    )


def quarter_dirs() -> list[str]:
    cdir = chunks_dir()
    files = sorted(f for f in os.listdir(cdir) if f.endswith(".parquet"))
    out = []
    for q in range(4):
        qdir = cdir + f".q{q}"
        if not os.path.isdir(qdir):
            os.makedirs(qdir + ".tmp", exist_ok=True)
            for f in files[q::4]:
                os.symlink(os.path.join(cdir, f), os.path.join(qdir + ".tmp", f))
            os.replace(qdir + ".tmp", qdir)
        out.append(qdir)
    return out


def worker(cpus: int, inp: str) -> None:
    from pyspark.sql import SparkSession

    from pdf_parser_spark import golden as G
    from pdf_parser_spark.pipeline import run_extraction, session_defaults

    b = session_defaults(
        SparkSession.builder.master(f"local[{cpus}]").appName("mexec"), cpus=cpus
    )
    if os.access("/dev/shm", os.W_OK):
        d = f"/dev/shm/spark-local-{os.getpid()}"
        os.makedirs(d, exist_ok=True)
        b = b.config("spark.local.dir", d)
    spark = (
        b.config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm = G.ensure_transcripts("/root/testdata/sf0.001")
    run_extraction(spark, warm, num_partitions=cpus).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()
    t0 = time.time()
    run_extraction(spark, inp, num_partitions=cpus).write.format("noop").mode(
        "overwrite"
    ).save()
    print(json.dumps({"sec": round(time.time() - t0, 3)}))
    spark.stop()


def run_one(cpus: int, inp: str, pin: str | None):
    cmd = [sys.executable, os.path.abspath(__file__), "--worker", str(cpus), inp]
    if pin:
        cmd = ["taskset", "-c", pin] + cmd
    return subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True, cwd=REPO)


def parse(proc) -> float:
    out, _ = proc.communicate(timeout=3600)
    return json.loads([l for l in out.splitlines() if l.startswith("{")][-1])["sec"]


def orchestrate() -> None:
    qdirs = quarter_dirs()
    cdir = chunks_dir()
    pins = ["0-7", "8-15", "16-23", "24-31"]
    trials = []
    for t in range(TRIALS):
        if t % 2 == 0:
            t_full = parse(run_one(8, cdir, None))
            procs = [run_one(8, q, p) for q, p in zip(qdirs, pins)]
            t_multi = max(parse(p) for p in procs)
        else:
            procs = [run_one(8, q, p) for q, p in zip(qdirs, pins)]
            t_multi = max(parse(p) for p in procs)
            t_full = parse(run_one(8, cdir, None))
        trials.append(
            {
                "one_executor_full_sec": t_full,
                "four_executors_max_sec": t_multi,
                "efficiency": round(t_full / (4 * t_multi), 3),
            }
        )
        print(json.dumps(trials[-1]), flush=True)
    effs = sorted(x["efficiency"] for x in trials)
    print(
        json.dumps(
            {"trials": trials, "median_efficiency": effs[len(effs) // 2]}
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
    else:
        orchestrate()
