"""Benchmark harness — prints ONE JSON line for the driver.

Times the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the crawl-engine
epoch loop and a single-batch frontier-scheduling job on the synthetic
web, reporting frontier URLs scheduled/sec and pages fetched/sec
(BASELINE.json metric). Scaling evidence across parallelism levels lives
in scripts/scaling_bench.py → BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def time_df(fn, *args):
    t0 = time.time()
    df = fn(*args)
    n = df.count()
    return time.time() - t0, n


def crawl_engine_bench(spark, n_pages=50_000, epochs=4):
    """Engine-loop throughput: big quotas (10-min epochs) so batches are
    thousands of URLs; corpus pre-materialized so generation cost is not
    billed to the engine; throughput-profile config (commit every 2
    epochs, no extra metrics scan)."""
    from pyspark.sql import functions as F

    from crawler_spark.engine import CrawlEngine, EngineConfig
    from crawler_spark.schema import ROBOTS_SCHEMA
    from crawler_spark.synth import SynthConfig, corpus_df, robots_rows, seed_urls

    cfg = SynthConfig(n_pages=n_pages, n_hosts=50, with_images=False)
    cdir = tempfile.mkdtemp(prefix="bench-corpus-")
    corpus_df(spark, cfg).write.mode("overwrite").parquet(cdir)
    corpus = spark.read.parquet(cdir).persist()
    corpus.count()
    robots = spark.createDataFrame(robots_rows(cfg), ROBOTS_SCHEMA)
    ck = tempfile.mkdtemp(prefix="bench-ck-")
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(max_epochs=epochs, epoch_ms=600_000, checkpoint_dir=ck,
                     commit_every=2, detailed_metrics=False,
                     n_seen_buckets=64),
    )
    # seed every host with its first few pages for wide epoch-1 batches
    seeds = seed_urls(cfg, 50)
    t0 = time.time()
    eng.run(seeds)
    dt = time.time() - t0
    m = eng.metrics.collect()
    scheduled = sum(r.urls_scheduled for r in m)
    fetched = sum(r.pages_fetched for r in m)
    corpus.unpersist()
    shutil.rmtree(ck, ignore_errors=True)
    shutil.rmtree(cdir, ignore_errors=True)
    return dt, scheduled, fetched


_CORPUS_CACHE: dict = {}


def _materialized_corpus(spark, n_pages):
    """Synthetic corpus written to parquet once per (session, size) —
    generation cost must not be billed to the engine job under test."""
    key = (id(spark), n_pages)
    if key not in _CORPUS_CACHE:
        from crawler_spark.synth import SynthConfig, corpus_df

        cfg = SynthConfig(n_pages=n_pages, n_hosts=200, with_images=False)
        d = tempfile.mkdtemp(prefix=f"bench-web-{n_pages}-")
        corpus_df(spark, cfg).write.mode("overwrite").parquet(d)
        _CORPUS_CACHE[key] = d
    return spark.read.parquet(_CORPUS_CACHE[key])


def frontier_batch_bench(spark, n_pages=200_000):
    """Single-batch frontier job over a pre-materialized parquet web:
    politeness window + link extract + within-batch dedup + seen
    anti-join. One wide job — the scaling-efficiency workload
    (scripts/scaling_bench.py reruns it at two parallelism levels)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from crawler_spark.extract import extract_candidates

    corpus = _materialized_corpus(spark, n_pages)
    w = Window.partitionBy("host").orderBy("url")
    selected = (
        corpus.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2000)
        .withColumn("seq", F.xxhash64("url"))
        .select("seq", "url", "host", "out_links")
    )
    cand = extract_candidates(selected)
    seen = corpus.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == 0).select("url")
    fresh = cand.join(seen, "url", "left_anti")
    t0 = time.time()
    n = fresh.count()
    return time.time() - t0, n


def main():
    from crawler_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    qs = entrymod.queries()
    headline = [
        "pricing_summary", "join_agg", "top_order_per_customer", "running_sum",
        "sessionize", "ngram_jaccard", "minhash_lsh_pairs", "simhash",
        "embed_topk", "lsh_ann_topk", "link_extract", "url_seen_antijoin",
        "politeness_quota", "xpath_char_score", "dominated_prune",
        "token_counts", "lang_id", "connected_components",
    ]
    times = {}
    for name in headline:
        try:
            dt, _n = time_df(qs[name], spark, SF_DIR)
            times[name] = round(dt, 3)
        except Exception as e:  # keep the bench alive; report the miss
            times[name] = None
            print(f"bench query {name} failed: {e}", file=sys.stderr)

    crawl_dt, scheduled, fetched = crawl_engine_bench(spark)
    times["crawl_engine_3epochs"] = round(crawl_dt, 3)
    batch_dt, batch_rows = frontier_batch_bench(spark)
    times["frontier_batch_200k"] = round(batch_dt, 3)

    total = round(sum(t for t in times.values() if t is not None), 3)
    out = {
        "metric": "headline query suite + crawl engine wall time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "cpus": CPUS,
        "frontier_urls_scheduled_per_sec": round(scheduled / crawl_dt, 1),
        "pages_fetched_per_sec": round(fetched / crawl_dt, 1),
        "frontier_batch_rows_per_sec": round(batch_rows / batch_dt, 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
