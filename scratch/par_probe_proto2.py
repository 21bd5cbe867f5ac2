"""Prototype 2: 8 THREADS each running a compute-bound numpy kernel
(np.exp over an L2-resident array; ufuncs release the GIL), so the
probe samples aggregate multi-core capacity with ~ms startup jitter
instead of fork noise."""
import sys
import threading
import time

import numpy as np


def _spin(buf, iters):
    for _ in range(iters):
        np.exp(buf)


def par_probe(workers: int = 8, iters: int = 40) -> float:
    bufs = [np.linspace(0.0, 1.0, 100_000) for _ in range(workers)]
    threads = [threading.Thread(target=_spin, args=(b, iters)) for b in bufs]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return time.perf_counter() - t0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    for i in range(n):
        print(f"par_probe(th): {par_probe():.3f}s", flush=True)
        time.sleep(1)
