"""Worker for the two-parallelism scaling benchmark: one JVM per
invocation (Spark master can't change in-process), runs the full
north-star constraint suite over a pre-written parquet tokenized table.

Usage: python bench/_scale_worker.py <threads> <data_path> <n_runs>
Prints one JSON line: {"threads": t, "n_rows": n, "times_sec": [...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(threads: int, data_path: str, n_runs: int):
    from datatest_spark.session import get_spark
    from datatest_spark.plans.suite import north_star_suite
    from datatest_spark.sources.synth import ALLOWED_SOURCES

    spark = get_spark(
        app_name="scale-worker-{0}".format(threads),
        master="local[{0}]".format(threads),
        shuffle_partitions=threads,
    )
    df = spark.read.parquet(data_path)
    n_rows = df.count()

    times = []
    for i in range(n_runs):
        suite = north_star_suite(ALLOWED_SOURCES)
        t0 = time.time()
        res = suite.run(df, run_id="scale-{0}-{1}".format(threads, i))
        res.violations.count()
        times.append(round(time.time() - t0, 3))
    print(json.dumps({"threads": threads, "n_rows": n_rows, "times_sec": times}))


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], int(sys.argv[3]))
