"""TTL recrawl expiry: pages last scheduled T epochs ago leave URL-seen
(cuckoo fingerprint delete / bloom rebuild) so re-discovered links crawl
them fresh. Gate = exact crawl-order + URL-seen parity vs the sequential
oracle with the same TTL rule."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine, EngineConfig
from crawler_spark.oracle import crawl_oracle
from crawler_spark.schema import ROBOTS_SCHEMA
from crawler_spark.synth import SynthConfig, corpus_df, robots_rows, seed_urls


@pytest.fixture(scope="module")
def web(spark):
    cfg = SynthConfig(n_pages=300, n_hosts=6, with_images=False)
    corpus = corpus_df(spark, cfg).persist()
    corpus.count()
    robots = spark.createDataFrame(robots_rows(cfg), ROBOTS_SCHEMA)
    return cfg, corpus, robots


def _parity(spark, web, tmpdir, seen_filter, ttl=2, max_epochs=6):
    cfg, corpus, robots = web
    seeds = seed_urls(cfg, 3)
    oracle = crawl_oracle(
        cfg, seeds, robots_rows(cfg), max_epochs=max_epochs, epoch_ms=8000,
        recrawl_ttl_epochs=ttl,
    )
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(
            max_epochs=max_epochs, epoch_ms=8000, n_seen_buckets=8,
            checkpoint_dir=str(tmpdir), seen_filter=seen_filter,
            cuckoo_n_buckets=1 << 10, recrawl_ttl_epochs=ttl,
        ),
    )
    eng.run(seeds)
    got_order = [(r.seq, r.url, r.epoch) for r in eng.crawl_order.collect()]
    want_order = [(s, u, e) for (s, u, e, _h) in oracle.crawl_order]
    assert got_order == want_order
    assert {r.url for r in eng.url_seen.collect()} == oracle.url_seen
    # non-vacuous: expiry must actually cause at least one refetch
    urls = [u for (_s, u, _e) in got_order]
    assert len(urls) > len(set(urls)), "no url was recrawled — TTL untested"
    return oracle, eng


def test_ttl_parity_cuckoo(spark, web, tmp_path):
    _parity(spark, web, tmp_path / "ck_cuckoo", "cuckoo")


def test_ttl_parity_bloom_rebuild(spark, web, tmp_path):
    """Bloom can't delete bits — expiry rebuilds segments from the
    surviving seen set; results must be identical to the cuckoo path."""
    _parity(spark, web, tmp_path / "ck_bloom", "bloom")


def test_no_ttl_means_no_refetch(spark, web, tmp_path):
    cfg, corpus, robots = web
    seeds = seed_urls(cfg, 3)
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(max_epochs=6, epoch_ms=8000, n_seen_buckets=8,
                     checkpoint_dir=str(tmp_path / "ck")),
    )
    eng.run(seeds)
    urls = [r.url for r in eng.crawl_order.collect()]
    assert len(urls) == len(set(urls))


def test_delete_passthrough_preserves_untouched_segments(spark):
    from crawler_spark.cuckoo import build_cuckoo_segments, delete_from_cuckoo_segments
    from crawler_spark.seen import bucket_expr

    def mk(urls):
        df = spark.createDataFrame([(u,) for u in urls], ["url"]).withColumn(
            "url_hash", F.xxhash64("url")
        )
        return df.withColumn("partition_id", bucket_expr(F.col("url_hash"), 8))

    seen = mk([f"http://h.test/p/{i}" for i in range(400)])
    segs = build_cuckoo_segments(seen, None, 1 << 10)
    before = {r.partition_id: bytes(r.bits) for r in segs.collect()}
    # expire only rows of one partition
    victims = mk([f"http://h.test/p/{i}" for i in range(400)]).filter(
        F.col("partition_id") == 3
    )
    n_victims = victims.count()
    assert n_victims > 0
    after_df = delete_from_cuckoo_segments(segs, victims)
    after = {r.partition_id: bytes(r.bits) for r in after_df.collect()}
    assert set(after) == set(before)
    for pid, blob in before.items():
        if pid == 3:
            assert after[pid] != blob
        else:
            assert after[pid] == blob, f"segment {pid} should be byte-identical"
