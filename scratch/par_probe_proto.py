"""Prototype: multi-process CPU probe that samples AGGREGATE host
capacity (the single-thread probe needs only one free core to read
quiet; 32-way bench work sees contention it cannot).

Measures: wall time for 8 forked workers each running the same
arithmetic loop as bench._cpu_probe but 1M iters. Idle reference to be
calibrated here."""
import multiprocessing as mp
import sys
import time


def _spin(_):
    x = 0
    t0 = time.perf_counter()
    for _ in range(1_000_000):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
    return time.perf_counter() - t0


def par_probe(workers: int = 8) -> float:
    t0 = time.perf_counter()
    with mp.get_context("fork").Pool(workers) as pool:
        pool.map(_spin, range(workers))
    return time.perf_counter() - t0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    for i in range(n):
        print(f"par_probe: {par_probe():.3f}s", flush=True)
        time.sleep(1)
