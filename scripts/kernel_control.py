#!/usr/bin/env python
"""Workload-exact host-scaling control: the extraction kernel WITHOUT Spark.

Runs kernels.extract.extract_batch (the exact per-turn work the Spark job
does inside mapInPandas) over pre-partitioned pandas chunks of the bench
corpus with a plain multiprocessing pool at each level — no JVM, no
shuffle, no Arrow, no scheduler. Whatever 8->32 efficiency THIS loop
achieves is the ceiling the host grants our actual workload mix; the Spark
job cannot be expected to beat it, and matching it means the engine adds no
scaling loss of its own.

Prints one JSON line with per-level wall seconds and the N->4N efficiency.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(os.environ.get("SCALE_MULT", "256"))
LEVELS = tuple(int(x) for x in os.environ.get("CONTROL_LEVELS", "8,32").split(","))
TRIALS = int(os.environ.get("CONTROL_TRIALS", "3"))


def _work(chunk_path: str) -> int:
    import pandas as pd

    from pdf_parser_spark.kernels.extract import extract_batch

    pdf = pd.read_parquet(chunk_path, columns=["conv_id", "turn_idx", "text"])
    out = extract_batch(pdf)
    return len(out)


def main() -> None:
    import pyarrow.parquet as pq

    from pdf_parser_spark import golden as G

    src = os.path.join(G.CACHE_DIR, f"transcripts_{G.sf_tag(SF_DIR)}_x{MULT}.parquet")
    n_rows = pq.read_metadata(src).num_rows
    # pre-split into 128 chunk files once (excluded from timing) so every
    # level schedules identical units
    chunk_dir = src + ".chunks"
    if not os.path.isdir(chunk_dir):
        os.makedirs(chunk_dir + ".tmp", exist_ok=True)
        pf = pq.ParquetFile(src)
        n_chunks = 128
        per = (n_rows + n_chunks - 1) // n_chunks
        import pyarrow as pa

        batches = pf.iter_batches(batch_size=per)
        for i, b in enumerate(batches):
            pq.write_table(pa.Table.from_batches([b]), f"{chunk_dir}.tmp/c{i:03d}.parquet")
        os.replace(chunk_dir + ".tmp", chunk_dir)
    chunks = sorted(
        os.path.join(chunk_dir, f) for f in os.listdir(chunk_dir) if f.endswith(".parquet")
    )

    results = {n: [] for n in LEVELS}
    for t in range(TRIALS):
        order = LEVELS if t % 2 == 0 else tuple(reversed(LEVELS))
        for n in order:
            t0 = time.time()
            with mp.Pool(n) as pool:
                done = sum(pool.map(_work, chunks, chunksize=1))
            assert done == n_rows, (done, n_rows)
            results[n].append(round(time.time() - t0, 2))
    a, b = min(LEVELS), max(LEVELS)
    effs = [round((results[a][t] / results[b][t]) / (b / a), 3) for t in range(TRIALS)]
    effs_sorted = sorted(effs)
    print(
        json.dumps(
            {
                "turns": n_rows,
                "levels_sec": {str(k): v for k, v in results.items()},
                "per_trial_eff": effs,
                "median_eff": effs_sorted[len(effs_sorted) // 2],
            }
        )
    )


if __name__ == "__main__":
    main()
