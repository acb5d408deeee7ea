#!/usr/bin/env python
"""Traffic-scaling A/B — the missing attribution experiment for the 8->32
pair (VERDICT r02: "nothing varies the engine's data-plane traffic to show
efficiency tracks bytes moved").

Design: constant rows + constant kernel work, varying bytes moved. The
extraction corpus gains a BALLAST binary column of 0 / 2048 / 8192 bytes
per row. The kernel ignores it (extract_batch reads only `text`), but the
engine's data plane must carry it through the scan, the salt shuffle
(repartition shuffles every input column), and the Arrow crossing into the
Python workers — so bytes moved scale with ballast while kernel CPU stays
fixed.

Prediction under the bandwidth-bound hypothesis (BENCH/BASELINE.md: host
aggregate copy bandwidth grows only ~2x from 8 to 32 procs): 8->32
efficiency DEGRADES monotonically as ballast grows, and at ballast=0
approaches the workload-exact mp.Pool control (which reads only the three
kernel columns and is therefore traffic-constant by construction — it is
interleaved in the same windows to anchor host conditions).

Each trial runs both parallelism levels back-to-back in fresh JVMs
(alternating order); medians over N_TRIALS are reported. Appends a section
to BENCH/BASELINE.md and prints one JSON line.

Usage:
    python scripts/traffic_scaling.py                       # orchestrate
    python scripts/traffic_scaling.py --worker CPUS PATH    # one spark run
    python scripts/traffic_scaling.py --control CPUS        # kernel pool run
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(os.environ.get("TRAFFIC_MULT", "64"))
BALLASTS = [0, 2048, 8192]
N_TRIALS = int(os.environ.get("TRAFFIC_TRIALS", "3"))
PAIR = (8, 32)


def base_input() -> str:
    from pdf_parser_spark import golden as G

    return os.path.join(G.CACHE_DIR, f"transcripts_{G.sf_tag(SF_DIR)}_x{MULT}.parquet")


def ballast_input(per_row: int) -> str:
    return base_input().replace(".parquet", f"_b{per_row}.parquet")


def make_ballast(per_row: int) -> str:
    """Append an incompressible binary column of per_row bytes to each turn.

    np.random with a per-batch fixed seed: deterministic for a bench and
    incompressible, so parquet zstd / shuffle lz4 cannot collapse the
    traffic (zero-filled ballast would).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    dst = ballast_input(per_row)
    if os.path.exists(dst):
        return dst
    if per_row == 0:
        return base_input()
    pf = pq.ParquetFile(base_input())
    writer = None
    try:
        for i, b in enumerate(pf.iter_batches(batch_size=8192)):
            rng = np.random.RandomState(1000 + i)
            blob = rng.bytes(per_row * b.num_rows)
            col = pa.array(
                [blob[k * per_row : (k + 1) * per_row] for k in range(b.num_rows)],
                type=pa.binary(),
            )
            t = pa.Table.from_batches([b]).append_column("ballast", col)
            if writer is None:
                writer = pq.ParquetWriter(dst + ".tmp", t.schema, compression="zstd")
            writer.write_table(t, row_group_size=2048)
    finally:
        if writer is not None:
            writer.close()
    os.replace(dst + ".tmp", dst)
    return dst


def worker(cpus: int, path: str) -> None:
    from pyspark.sql import SparkSession

    from pdf_parser_spark import golden as G
    from pdf_parser_spark.pipeline import (
        extract_turns,
        reassemble,
        run_extraction,
        session_defaults,
    )

    b = session_defaults(
        SparkSession.builder.master(f"local[{cpus}]").appName(f"traffic{cpus}"),
        cpus=cpus,
    )
    if os.access("/dev/shm", os.W_OK):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        b = b.config("spark.local.dir", "/dev/shm/spark-local")
    spark = (
        b.config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm = G.ensure_transcripts("/root/testdata/sf0.001")
    run_extraction(spark, warm, num_partitions=cpus).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()
    # read WITHOUT a fixed schema so the ballast column (when present) rides
    # the scan -> salt shuffle -> Arrow crossing; the kernel ignores it
    df = spark.read.parquet(path)
    t0 = time.time()
    reassemble(extract_turns(df), num_partitions=cpus).write.format("noop").mode(
        "overwrite"
    ).save()
    sec = time.time() - t0
    print(json.dumps({"cpus": cpus, "sec": round(sec, 3)}))
    spark.stop()


def _control_work(chunk_path: str) -> int:
    import pandas as pd

    from pdf_parser_spark.kernels.extract import extract_batch

    pdf = pd.read_parquet(chunk_path, columns=["conv_id", "turn_idx", "text"])
    return len(extract_batch(pdf))


def control(cpus: int) -> None:
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from scaling_bench import _control_chunks

    chunks = _control_chunks(MULT)
    t0 = time.time()
    with mp.Pool(cpus) as pool:
        total = sum(pool.map(_control_work, chunks, chunksize=1))
    print(json.dumps({"cpus": cpus, "sec": round(time.time() - t0, 3), "turns": total}))


def orchestrate() -> None:
    from pdf_parser_spark.datagen import generate_transcripts_multi

    if not os.path.exists(base_input()):
        generate_transcripts_multi(SF_DIR, base_input(), mult=MULT)
    paths = {bl: make_ballast(bl) for bl in BALLASTS}
    sizes = {bl: round(os.path.getsize(p) / 1e9, 2) for bl, p in paths.items()}

    def run_sub(args):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *args],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])
        return json.loads(lines[-1])

    a, b = PAIR

    def eff(sa, sb):
        return round((sa / sb) / (b / a), 3)

    results = {bl: [] for bl in BALLASTS}
    ctl = []
    for t in range(N_TRIALS):
        order = PAIR if t % 2 == 0 else tuple(reversed(PAIR))
        # one window = all ballast levels + the control, same host conditions
        for bl in BALLASTS:
            one = {c: run_sub(["--worker", str(c), paths[bl]]) for c in order}
            results[bl].append(
                {
                    "sec": {a: one[a]["sec"], b: one[b]["sec"]},
                    "eff": eff(one[a]["sec"], one[b]["sec"]),
                }
            )
        cone = {c: run_sub(["--control", str(c)]) for c in order}
        ctl.append(
            {
                "sec": {a: cone[a]["sec"], b: cone[b]["sec"]},
                "eff": eff(cone[a]["sec"], cone[b]["sec"]),
            }
        )

    def median(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    summary = {
        "pair": f"local[{a}]->local[{b}]",
        "mult": MULT,
        "ballast_bytes": BALLASTS,
        "input_GB": sizes,
        "eff_by_ballast": {
            str(bl): {
                "trials": [r["eff"] for r in results[bl]],
                "median": median([r["eff"] for r in results[bl]]),
                "capability": eff(
                    min(r["sec"][a] for r in results[bl]),
                    min(r["sec"][b] for r in results[bl]),
                ),
                "sec_median": {
                    a: median([r["sec"][a] for r in results[bl]]),
                    b: median([r["sec"][b] for r in results[bl]]),
                },
            }
            for bl in BALLASTS
        },
        "control_eff": {
            "trials": [r["eff"] for r in ctl],
            "median": median([r["eff"] for r in ctl]),
        },
    }
    print(json.dumps(summary))

    md = [
        "\n## Traffic-scaling A/B — no-salt default pipeline "
        "(constant rows + kernel, varying bytes moved)\n"
    ]
    md.append(
        f"Corpus x{MULT}, {N_TRIALS} trials per cell (raw trials in the JSON); "
        f"ballast rides scan + Arrow only — the default pipeline no longer "
        f"shuffles the payload before the kernel (salt is opt-in), so bytes "
        f"moved per ballast byte drop by the former shuffle write+read. "
        f"Control = workload-exact mp.Pool (traffic-constant), interleaved "
        f"in the same windows.\n"
    )
    md.append("| ballast/row | input GB | 8->32 eff (median) | capability |")
    md.append("|---|---|---|---|")
    for bl in BALLASTS:
        e = summary["eff_by_ballast"][str(bl)]
        md.append(f"| {bl} B | {sizes[bl]} | {e['median']} | {e['capability']} |")
    md.append(
        f"| control (no Spark) | — | {summary['control_eff']['median']} "
        f"(trials {summary['control_eff']['trials']}) | — |"
    )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(md) + "\n")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3])
    elif len(sys.argv) > 1 and sys.argv[1] == "--control":
        control(int(sys.argv[2]))
    else:
        orchestrate()
