"""Hardware-ceiling control for the N->4N scaling criterion: run the
SAME fixed amount of work at 8 and 32 multiprocessing workers (no
Spark, no JVM), once cache-resident (pure ALU) and once
memory-streaming (the access pattern shuffles/Arrow/parquet actually
have). If even plain numpy can't scale 8->32 on this box, the Spark
build's 8->32 efficiency ceiling is the memory bus, not the engine.
Prints one JSON line."""
import json
import multiprocessing as mp
import time

import numpy as np


def alu_task(n: int) -> int:
    # cache-resident integer hashing loop
    acc = 0
    x = 1469598103934665603
    for i in range(n):
        x = (x ^ i) * 1099511628211 % (1 << 64)
        acc ^= x
    return acc


def stream_task(n: int) -> float:
    # memory-streaming: touch ~n*8 bytes far beyond L3
    a = np.arange(n, dtype=np.int64)
    s = 0.0
    for _ in range(4):
        a = (a * 31 + 7) % 2147483647
        s += float(a.sum())
    return s


def run(task, total_units: int, workers: int, unit: int) -> float:
    jobs = [unit] * (total_units // unit)
    t0 = time.time()
    with mp.Pool(workers) as pool:
        pool.map(task, jobs)
    return time.time() - t0


def best_of(fn, reps=2):
    return min(fn() for _ in range(reps))


if __name__ == "__main__":
    out = {}
    for name, task, total, unit in [
        ("alu", alu_task, 64 * 400_000, 400_000),
        ("stream", stream_task, 64 * 4_000_000, 4_000_000),
    ]:
        t8 = best_of(lambda: run(task, total, 8, unit))
        t32 = best_of(lambda: run(task, total, 32, unit))
        out[name] = {
            "secs_8w": round(t8, 2),
            "secs_32w": round(t32, 2),
            "speedup_8_to_32": round(t8 / t32, 2),
            "efficiency_8_to_32": round(t8 / t32 / 4.0, 3),
        }
    print(json.dumps(out))
