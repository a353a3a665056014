"""Sustained-scale engine run: the amortization evidence.

The 5-epoch/30k-page bench loop in bench.py is latency-bound by design
(small batches stress the per-epoch floor). This script runs the loop
the way a cluster would see it — 8 epochs over a 500k-page / 200-host
synthetic web with wide politeness quotas — so per-epoch batches widen
into the tens of thousands and the fixed per-epoch cost (job latency +
commit) amortizes. Reports overall URLs scheduled+fetched/s plus the
per-epoch batch widths; records sustained_result.json next to the other
bench artifacts.

Usage: python scripts/sustained_bench.py [n_pages] [epochs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def _scratch(prefix):
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix=prefix, dir=base)


def main():
    from crawler_spark.engine import CrawlEngine, EngineConfig
    from crawler_spark.schema import ROBOTS_SCHEMA
    from crawler_spark.session import get_spark
    from crawler_spark.synth import (
        SynthConfig, corpus_df, robots_rows, seed_urls, url_of_index,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("sustained", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    # untimed warm-up (codegen, committer, broadcast machinery)
    wcfg = SynthConfig(n_pages=1_500, n_hosts=10, with_images=False)
    wck = _scratch("sus-warm-")
    CrawlEngine(
        spark, corpus_df(spark, wcfg),
        spark.createDataFrame(robots_rows(wcfg), ROBOTS_SCHEMA),
        EngineConfig(max_epochs=2, epoch_ms=60_000, checkpoint_dir=wck,
                     detailed_metrics=False),
    ).run(seed_urls(wcfg, 4))
    shutil.rmtree(wck, ignore_errors=True)

    cfg = SynthConfig(n_pages=N_PAGES, n_hosts=200, with_images=False)
    cdir = _scratch("sus-corpus-")
    corpus_df(spark, cfg).write.mode("overwrite").parquet(cdir)
    corpus = spark.read.parquet(cdir).persist()
    corpus.count()
    robots = spark.createDataFrame(robots_rows(cfg), ROBOTS_SCHEMA)
    bounds = cfg.host_bounds
    seeds = [
        url_of_index(cfg, int(bounds[h]) + k)
        for h in range(cfg.n_hosts)
        for k in range(4)
        if bounds[h] + k < bounds[h + 1]
    ]

    ck = _scratch("sus-ck-")
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(max_epochs=EPOCHS, epoch_ms=600_000, checkpoint_dir=ck,
                     commit_every=4, detailed_metrics=False,
                     n_seen_buckets=64),
    )
    t0 = time.time()
    eng.run(seeds)
    dt = time.time() - t0
    m = sorted(eng.metrics.collect(), key=lambda r: r.epoch)
    scheduled = sum(r.urls_scheduled for r in m)
    fetched = sum(r.pages_fetched for r in m)
    out = {
        "workload": f"engine loop {EPOCHS} epochs, {N_PAGES}-page web, "
                    f"local[{cpus}], tmpfs, commit_every=4",
        "wall_sec": round(dt, 1),
        "urls_scheduled": scheduled,
        "pages_fetched": fetched,
        "urls_per_sec": round((scheduled + fetched) / 2 / dt, 1),
        "scheduled_plus_fetched_per_sec": round((scheduled + fetched) / dt, 1),
        "per_epoch_batch": [r.urls_scheduled for r in m],
    }
    print(json.dumps(out))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "sustained_result.json"), "w") as f:
        json.dump(out, f, indent=2)
    shutil.rmtree(ck, ignore_errors=True)
    corpus.unpersist()
    shutil.rmtree(cdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
