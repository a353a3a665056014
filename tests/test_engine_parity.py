"""North-rule gate: the Spark engine must reproduce the sequential
oracle's EXACT crawl order and final URL-seen set on the same synthetic
web, same seeds, same politeness budget (BASELINE.json north_rule;
SURVEY.md §5)."""

import pytest

from crawler_spark.engine import CrawlEngine, EngineConfig
from crawler_spark.oracle import crawl_oracle
from crawler_spark.synth import SynthConfig, corpus_df, robots_rows, seed_urls
from crawler_spark.schema import ROBOTS_SCHEMA


@pytest.fixture(scope="module")
def web(spark):
    cfg = SynthConfig(n_pages=600, n_hosts=12, with_images=False)
    corpus = corpus_df(spark, cfg).persist()
    corpus.count()
    robots = spark.createDataFrame(robots_rows(cfg), ROBOTS_SCHEMA)
    return cfg, corpus, robots


def _run_both(spark, cfg, corpus, robots, use_bloom, tmpdir, max_epochs=5, epoch_ms=8000):
    seeds = seed_urls(cfg, 5)
    oracle = crawl_oracle(cfg, seeds, robots_rows(cfg), max_epochs=max_epochs, epoch_ms=epoch_ms)
    eng = CrawlEngine(
        spark,
        corpus,
        robots,
        EngineConfig(
            max_epochs=max_epochs,
            epoch_ms=epoch_ms,
            use_bloom=use_bloom,
            checkpoint_dir=str(tmpdir),
            n_seen_buckets=8,
            bloom_m_bits=1 << 16,
        ),
    )
    eng.run(seeds)
    return oracle, eng


def test_crawl_order_and_seen_parity(spark, web, tmp_path):
    cfg, corpus, robots = web
    oracle, eng = _run_both(spark, cfg, corpus, robots, True, tmp_path / "ck1")

    got_order = [(r.seq, r.url, r.epoch) for r in eng.crawl_order.collect()]
    want_order = [(s, u, e) for (s, u, e, _h) in oracle.crawl_order]
    assert len(got_order) > 50, "crawl should actually expand"
    assert got_order == want_order

    got_seen = {r.url for r in eng.url_seen.collect()}
    assert got_seen == oracle.url_seen

    got_metrics = [
        (r.epoch, r.urls_scheduled, r.pages_fetched, r.links_extracted,
         r.links_enqueued, r.dups_dropped, r.disallowed_dropped)
        for r in eng.metrics.collect()
    ]
    want_metrics = [
        (m["epoch"], m["urls_scheduled"], m["pages_fetched"], m["links_extracted"],
         m["links_enqueued"], m["dups_dropped"], m["disallowed_dropped"])
        for m in oracle.metrics
    ]
    assert got_metrics == want_metrics


def test_parity_without_bloom(spark, web, tmp_path):
    """Bloom is a prefilter only — disabling it must not change results."""
    cfg, corpus, robots = web
    oracle, eng = _run_both(
        spark, cfg, corpus, robots, False, tmp_path / "ck2", max_epochs=3
    )
    got_order = [(r.seq, r.url) for r in eng.crawl_order.collect()]
    assert got_order == [(s, u) for (s, u, _e, _h) in oracle.crawl_order]
    assert {r.url for r in eng.url_seen.collect()} == oracle.url_seen


def test_resume_from_snapshot(spark, web, tmp_path):
    """Kill after epoch k, resume from snapshot, final state identical to
    an uninterrupted run (north_rule: resumable from checkpoint)."""
    cfg, corpus, robots = web
    seeds = seed_urls(cfg, 5)
    base = dict(epoch_ms=8000, n_seen_buckets=8, bloom_m_bits=1 << 16)

    full = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(max_epochs=4, checkpoint_dir=str(tmp_path / "full"), **base),
    )
    full.run(seeds)

    part = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(max_epochs=2, checkpoint_dir=str(tmp_path / "part"), **base),
    )
    part.run(seeds)
    # new engine object, same checkpoint dir → resume and continue
    cont = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(max_epochs=4, checkpoint_dir=str(tmp_path / "part"), **base),
    )
    cont.resume()
    cont.run()

    a = [(r.seq, r.url) for r in full.crawl_order.collect()]
    b = [(r.seq, r.url) for r in cont.crawl_order.collect()]
    assert a == b
    assert {r.url for r in full.url_seen.collect()} == {
        r.url for r in cont.url_seen.collect()
    }


def test_politeness_quota_respected(spark, web, tmp_path):
    """No host exceeds its per-epoch quota in the realized schedule."""
    cfg, corpus, robots = web
    _oracle, eng = _run_both(
        spark, cfg, corpus, robots, True, tmp_path / "ck3", max_epochs=4
    )
    delays = {r["host"]: r["crawl_delay_ms"] for r in robots_rows(cfg)}
    from collections import Counter

    per_epoch_host = Counter()
    for r in eng.crawl_order.collect():
        per_epoch_host[(r.epoch, r.host)] += 1
    for (epoch, host), n in per_epoch_host.items():
        assert n <= max(1, 8000 // delays[host]), (epoch, host, n)
