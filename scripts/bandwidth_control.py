#!/usr/bin/env python
"""Memory-bandwidth control for the N-vs-4N scaling analysis.

The pure-CPU burn in scaling_bench.py is register-only; the extraction job
additionally streams ~GBs of payload strings through scans + two shuffles.
This control measures the host's AGGREGATE copy bandwidth with k processes
streaming concurrently (numpy copy of a buffer far larger than LLC): if
aggregate GB/s stops growing 8 -> 32, any memory-traffic-heavy job is
bandwidth-capped on this VM regardless of engine design — executors on a
real cluster each bring their own memory controllers, so the cap is a
single-host artifact, not a plan property.

Prints one JSON line: {procs: {k: aggregate_GBps}, scaling_8_32: r}.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np

SIZE_MB = 256
ITERS = 8


def _stream(q):
    a = np.ones(SIZE_MB * 1024 * 1024 // 8, dtype=np.float64)
    b = np.empty_like(a)
    t0 = time.time()
    for _ in range(ITERS):
        np.copyto(b, a)
        np.copyto(a, b)
    dt = time.time() - t0
    # each copyto reads+writes SIZE_MB
    q.put((2 * ITERS * 2 * SIZE_MB / 1024.0) / dt)


def measure(k: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_stream, args=(q,)) for _ in range(k)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return round(sum(vals), 1)


def main() -> None:
    out = {}
    for k in (1, 2, 8, 32):
        out[k] = measure(k)
    print(
        json.dumps(
            {
                "aggregate_GBps_by_procs": out,
                "scaling_8_to_32": round(out[32] / out[8], 3),
                "ideal": 4.0,
            }
        )
    )


if __name__ == "__main__":
    main()
