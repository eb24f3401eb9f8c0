"""Substrate control for the scaling benchmark: measures what THIS machine can
scale at all, independent of the engine.

Prints one JSON line: {"spark_hash_eps": ..., "master": ...} — a trivial
embarrassingly-parallel Spark job (xxhash count over range, no shuffle, no strings)
run at the same master as the engine legs. Plus, with --procs, a pure-python
register-only control and a numpy memory-streaming control (no JVM).

Rationale (measured in this sandbox): register-only CPU scales ~0.97 from 2→8
processes, but memory-streaming throughput COLLAPSES under parallelism (8 numpy
processes deliver less aggregate than 1). Spark row processing is memory-streaming —
any Spark job's N→4N efficiency on this box is bounded by that curve, so the
engine's efficiency must be read against this control, not against 1.0.
"""

from __future__ import annotations

import json
import sys
import time


def spark_hash_control(master: str) -> float:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(master).appName("substrate")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(0, 400_000_000, 1, 64)
    best = None
    for i in range(5):
        t0 = time.time()
        df.select(F.count(F.when(F.xxhash64("id", F.lit(i)) % 1000 == 0, 1))).collect()
        el = time.time() - t0
        best = el if best is None or el < best else best
    spark.stop()
    return 400_000_000 / best


def python_controls(k: int) -> dict:
    import multiprocessing as mp

    def int_burn(q):
        # best of 3 two-second windows (the box has bursty multi-second stalls;
        # a single window can be 40x off right after heavy JVM activity)
        best = 0
        for _ in range(3):
            x, n, t0 = 0, 0, time.time()
            while time.time() - t0 < 2:
                for _ in range(100000):
                    x = (x * 1103515245 + 12345) & 0x7FFFFFFF
                n += 100000
            best = max(best, n / 2)
        q.put(best)

    def np_burn(q):
        import numpy as np

        a = np.random.RandomState(1).rand(4_000_000)
        a = np.sqrt(a * 1.7 + 0.3) * 0.99 + 0.01  # warmup
        best = 0.0
        for _ in range(3):
            n, t0 = 0, time.time()
            while time.time() - t0 < 2:
                a = np.sqrt(a * 1.7 + 0.3) * 0.99 + 0.01
                n += 1
            best = max(best, n / 2)
        q.put(best)

    out = {}
    for name, fn in [("int_iters_per_s", int_burn), ("numpy_iters_per_s", np_burn)]:
        q = mp.Queue()
        ps = [mp.Process(target=fn, args=(q,)) for _ in range(k)]
        [p.start() for p in ps]
        total = sum(q.get() for _ in ps)
        [p.join() for p in ps]
        out[name] = round(total, 1)
    return out


if __name__ == "__main__":
    if sys.argv[1] == "--procs":
        print(json.dumps({"procs": int(sys.argv[2]), **python_controls(int(sys.argv[2]))}))
    else:
        master = sys.argv[1]
        print(json.dumps({"master": master, "spark_hash_eps": round(spark_hash_control(master), 1)}))
