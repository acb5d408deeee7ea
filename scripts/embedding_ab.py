#!/usr/bin/env python
"""Windowed round-robin A/B for the r03->r04 embedding_near_dup draw
(VERDICT r04 "What's wrong" #3 / next-round task #2).

Ground facts: operators/similarity.py:384 last materially changed in r03
(commit 2c8ef1f); the r04 driver draw doubled anyway (2.069 s -> 4.155 s at
sf0.1/local[32]). Every prior same-code swing of this magnitude was
adjudicated host noise by this windowed protocol (BENCH/BASELINE.md
r01->r02 section), but the protocol was not run for THIS query — so run it:
N consecutive trials of embedding_near_dup round-robin with two sentinels
that sample the same minutes (minhash_lsh_pairs, which itself swung 2.6x on
identical code in r04, and d1_exact_dedup as a light canary), reporting
min/median/max.

Interpretation rule (same as r01->r02): if the windowed MIN reproduces the
r03-era ~2 s, the r04 draw was host noise and there is no regression to
fix; if even the min sits at the r04 level, the regression is real and the
plan needs a diff (candidate: the .distinct() on the candidate set before
verify, operators/similarity.py).

Appends a section to BENCH/BASELINE.md and prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N = int(os.environ.get("AB_TRIALS", "7"))
QUERIES = ["embedding_near_dup", "minhash_lsh_pairs", "d1_exact_dedup"]
PRIOR = {  # (r03 draw, r04 draw) at sf0.1 (BENCH_r03/r04.json)
    "embedding_near_dup": (2.069, 4.155),
    "minhash_lsh_pairs": (4.78, 2.525),
    "d1_exact_dedup": (0.31, 0.21),
}


def main() -> None:
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    from pdf_parser_spark.caching import release_persisted
    from pdf_parser_spark.pipeline import session_defaults

    spark = (
        session_defaults(
            SparkSession.builder.master(f"local[{CPUS}]").appName("embab"), cpus=CPUS
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # warm-up every query once (JIT/codegen/python workers are session costs)
    for name in QUERIES:
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        release_persisted()

    trials: dict[str, list[float]] = {q: [] for q in QUERIES}
    for _ in range(N):
        for name in QUERIES:  # round-robin: all queries sample the same minutes
            df = qs[name](spark, SF_DIR)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            trials[name].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            release_persisted()
    spark.stop()

    def med(xs):
        s = sorted(xs)
        return s[len(s) // 2]

    out = {}
    lines = [
        "\n## r03->r04 embedding_near_dup adjudication (windowed round-robin A/B)\n",
        f"Identical code since r03 commit 2c8ef1f; {N} round-robin trials in one "
        "window at sf0.1/local[32]. Verdict rule: windowed min at the r03 level "
        "(~2 s) => the r04 driver draw was host noise, not a regression.\n",
        "| query | r03 | r04 | window min | median | max |",
        "|---|---|---|---|---|---|",
    ]
    for name in QUERIES:
        xs = trials[name]
        r3, r4 = PRIOR[name]
        out[name] = {
            "r03": r3, "r04": r4,
            "min": min(xs), "median": med(xs), "max": max(xs),
            "trials": xs,
            "noise_not_regression": min(xs) <= r3 * 1.35,
        }
        lines.append(
            f"| {name} | {r3} | {r4} | {min(xs)} | {med(xs)} | {max(xs)} |"
        )
    v = out["embedding_near_dup"]
    verdict = (
        "HOST NOISE — the windowed min reproduces the r03 number on identical code"
        if v["noise_not_regression"]
        else "REAL — the min stays at the r04 level; investigate the plan"
    )
    lines.append(f"\nVerdict (embedding_near_dup): {verdict}.")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
