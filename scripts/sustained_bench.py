"""Sustained-scale engine run: the amortization evidence.

The 5-epoch/30k-page bench loop in bench.py is latency-bound by design
(small batches stress the per-epoch floor). This script runs the loop
the way a cluster would see it — 8 epochs over a 500k-page / 200-host
synthetic web with wide politeness quotas — so per-epoch batches widen
into the tens of thousands and the fixed per-epoch cost (job latency +
commit) amortizes. Reports overall URLs scheduled+fetched/s plus the
per-epoch batch widths; records sustained_result.json next to the other
bench artifacts.

Usage: python scripts/sustained_bench.py [n_pages] [epochs] [images]

Passing a third arg ``images`` materializes the corpus WITH binary
image payloads + captions (the input_hint schema end to end) and writes
sustained_result_images.json instead — the evidence that the frontier
loop's throughput is payload-independent: the fetch join's projection
(engine.FETCH_COLS) leaves bytes/phash/dims inside the parquet scan's
column pruning (asserted in test_plans), so the engine never reads
them.
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
WITH_IMAGES = len(sys.argv) > 3 and sys.argv[3] == "images"


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

    cfg = SynthConfig(n_pages=N_PAGES, n_hosts=200, with_images=WITH_IMAGES)
    cdir = _scratch("sus-corpus-")
    corpus_df(spark, cfg).write.mode("overwrite").parquet(cdir)
    corpus = spark.read.parquet(cdir)
    payload_bytes = None
    if WITH_IMAGES:
        # no .persist(): in-heap caching would materialize the binary
        # payloads the engine never reads (1M deserialized image rows
        # OOM an 8g driver), and an uncached corpus is the honest
        # configuration anyway — every epoch's fetch join re-scans the
        # (tmpfs) parquet and the payload columns stay inside the
        # scan's column pruning (engine.FETCH_COLS; asserted in
        # test_plans). One deliberate full-payload pass here records
        # how many binary bytes the engine is scheduling over.
        from pyspark.sql import functions as F

        payload_bytes = corpus.agg(
            F.sum(F.length("bytes")).alias("b")
        ).collect()[0].b
    else:
        corpus = corpus.persist()
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
        "workload": f"engine loop {EPOCHS} epochs, {N_PAGES}-page web"
                    f"{' with binary image payloads' if WITH_IMAGES else ''}, "
                    f"local[{cpus}], tmpfs, commit_every=4",
        "wall_sec": round(dt, 1),
        "urls_scheduled": scheduled,
        "pages_fetched": fetched,
        "urls_per_sec": round((scheduled + fetched) / 2 / dt, 1),
        "scheduled_plus_fetched_per_sec": round((scheduled + fetched) / dt, 1),
        "per_epoch_batch": [r.urls_scheduled for r in m],
    }
    if payload_bytes is not None:
        out["image_payload_bytes_in_corpus"] = int(payload_bytes)
    print(json.dumps(out))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fname = "sustained_result_images.json" if WITH_IMAGES else "sustained_result.json"
    with open(os.path.join(here, fname), "w") as f:
        json.dump(out, f, indent=2)
    shutil.rmtree(ck, ignore_errors=True)
    corpus.unpersist()
    shutil.rmtree(cdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
