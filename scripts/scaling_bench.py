"""Scaling-efficiency evidence (BASELINE.json north_rule: ≥0.8 from N to
4N parallelism). No real cluster exists in this sandbox, so per the
round instructions the same job runs at local[8] and local[32] on the
same input; throughput at both + efficiency go into BENCH.md.

The workload is the single-batch frontier job from bench.py (politeness
window + link extraction + within-batch dedup + URL-seen anti-join over
a 200k-page synthetic web) — one wide shuffle-heavy job with no
driver-side loop, i.e. the part of the engine whose scaling matters at
10^10 rows.

Usage: python scripts/scaling_bench.py [n_pages]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import frontier_batch_bench  # noqa: E402


def run_at(cores: int, n_pages: int):
    from crawler_spark.session import get_spark

    spark = get_spark(
        f"scaling-{cores}", master=f"local[{cores}]", shuffle_partitions=cores * 2
    )
    # warm-up: JVM + codegen so the measured run isn't startup-bound
    frontier_batch_bench(spark, n_pages=max(2000, n_pages // 50))
    dt, rows = frontier_batch_bench(spark, n_pages=n_pages)
    spark.stop()
    time.sleep(3)
    return dt, rows


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    results = {}
    for cores in (8, 32):
        dt, rows = run_at(cores, n_pages)
        results[cores] = {"sec": round(dt, 2), "rows": rows,
                          "rows_per_sec": round(rows / dt, 1)}
        print(f"local[{cores}]: {dt:.2f}s, {rows} rows, {rows/dt:.0f} rows/s")
    speedup = results[8]["sec"] / results[32]["sec"]
    eff = speedup / 4.0
    out = {
        "workload": f"frontier_batch n_pages={n_pages}",
        "local8": results[8],
        "local32": results[32],
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency_Nto4N": round(eff, 3),
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "scaling_result.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
