"""Controlled A/B: engine-loop cost of action-path tracking.

Round 4 made per-page action-path arrays (FRONTIER_SCHEMA.path)
unconditionally on; the same round's crawl-engine bench moved 32.2 →
35.9 s (+11%) with all three trials slower. This script attributes the
delta properly: the SAME session, SAME pre-materialized 30k-page web,
SAME seeds, trials INTERLEAVED on/off so co-tenant box noise hits both
arms equally. Reports per-arm trial lists, min and median, and the
relative overhead; writes ab_track_paths.json at the repo root (pinned
in BENCH.md).

Usage: [AB_TRIALS=4] python scripts/ab_track_paths.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import engine_trial, engine_warmup, engine_web  # noqa: E402

TRIALS = int(os.environ.get("AB_TRIALS", "4"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from crawler_spark.session import get_spark

    spark = get_spark(
        "ab-track-paths", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    engine_warmup(spark)
    corpus, robots, seeds, cdir = engine_web(spark, 30_000)
    on, off = [], []
    # interleave arms: a noisy window on this shared box lands on both
    for i in range(TRIALS):
        for flag, bucket in ((True, on), (False, off)):
            dt, scheduled, fetched = engine_trial(
                spark, corpus, robots, seeds, epochs=5, track_paths=flag
            )
            bucket.append(round(dt, 3))
            print(
                f"trial {i} track_paths={flag}: {dt:.2f}s "
                f"({scheduled} scheduled)",
                file=sys.stderr,
            )
    corpus.unpersist()
    shutil.rmtree(cdir, ignore_errors=True)
    out = {
        "trials_on": on,
        "trials_off": off,
        "min_on": min(on),
        "min_off": min(off),
        "median_on": round(statistics.median(on), 3),
        "median_off": round(statistics.median(off), 3),
        "overhead_min_pct": round(100 * (min(on) / min(off) - 1), 1),
        "overhead_median_pct": round(
            100 * (statistics.median(on) / statistics.median(off) - 1), 1
        ),
        "urls_scheduled": scheduled,
        "cpus": CPUS,
        "n_pages": 30_000,
        "epochs": 5,
    }
    print(json.dumps(out))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "ab_track_paths.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
