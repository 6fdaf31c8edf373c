#!/usr/bin/env python
"""32-process fixed-work spin probe (PERF §§34/40/42 co-tenant detector).

Launches one CPU-bound worker per core doing a fixed amount of integer
work and prints the wall seconds of the slowest worker. On this box the
reading is ~0.69-0.71 s when the host is quiet and 1.1+ s inside a
co-tenant phase; bench draws are only comparable when bracketed by
quiet probes. Usage: python tools/spin_probe.py [nprocs]
"""
from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time


def _spin(_: int) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(6_000_000):
        # mask keeps x a machine int — unbounded growth would make the
        # loop quadratic in bigint digits instead of fixed work
        x = (x + (i ^ (x >> 3))) & 0xFFFFFFFF
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else (os.cpu_count() or 4)
    t0 = time.perf_counter()
    with mp.Pool(n) as pool:
        per = pool.map(_spin, range(n))
    wall = time.perf_counter() - t0
    print(
        f"probe nprocs={n} wall={wall:.2f}s "
        f"worker_max={max(per):.2f}s worker_med={sorted(per)[n // 2]:.2f}s"
    )


if __name__ == "__main__":
    main()
