"""E2 exemplar-cluster sampling (reference prepare-example,
crawl.clj:532-629): per (source page, xpath) group, seeded-sample
max(10, n//4) links, cluster the sampled downloads by caption char-freq
cosine (single linkage), enqueue ONE exemplar per cluster while every
survivor still enters URL-seen. Gates: exact crawl-order + URL-seen +
samples-table parity vs the sequential oracle, genuine divergence from
the full-BFS crawl, and non-vacuous clustering."""

import pytest

from crawler_spark import exemplar as ex
from crawler_spark.engine import CrawlEngine, EngineConfig
from crawler_spark.oracle import crawl_oracle
from crawler_spark.schema import ROBOTS_SCHEMA
from crawler_spark.synth import SynthConfig, corpus_df, robots_rows, seed_urls

THRESH = 0.8


def test_sample_rule_and_cluster_unit():
    # max(10, n//4): 12 links → 10 sampled; 80 → 20
    assert ex.sample_size(12) == 10
    assert ex.sample_size(80) == 20
    urls = [f"http://h.test/p/{i}" for i in range(12)]
    s = ex.sample_urls(urls)
    assert len(s) == 10 and s <= set(urls)
    # deterministic: same set every call
    assert s == ex.sample_urls(list(reversed(urls)))

    # cluster: identical texts merge, distinct text separates, a None
    # text (failed download) gets cluster -1 and is never an exemplar
    rows = [("u/b", "aaab"), ("u/a", "aaab"), ("u/c", "zzzz"), ("u/d", None)]
    out = ex.cluster(rows, threshold=0.99)
    assert out["u/a"] == (0, True)   # smallest url of cluster 0 wins
    assert out["u/b"] == (0, False)
    assert out["u/c"] == (1, True)
    assert out["u/d"] == (-1, False)


@pytest.fixture(scope="module")
def web(spark):
    cfg = SynthConfig(n_pages=600, n_hosts=8, with_images=False)
    corpus = corpus_df(spark, cfg).persist()
    corpus.count()
    robots = spark.createDataFrame(robots_rows(cfg), ROBOTS_SCHEMA)
    yield cfg, corpus, robots
    corpus.unpersist()


def test_exemplar_sampling_parity(spark, web, tmp_path):
    cfg, corpus, robots = web
    seeds = seed_urls(cfg, 5)
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(max_epochs=4, epoch_ms=10000,
                     checkpoint_dir=str(tmp_path / "ck_ex"),
                     exemplar_sampling=True,
                     exemplar_cosine_threshold=THRESH),
    )
    eng.run(seeds)
    oracle = crawl_oracle(
        cfg, seeds, robots_rows(cfg), max_epochs=4, epoch_ms=10000,
        exemplar_sampling=True, exemplar_threshold=THRESH,
    )
    got = [(r.seq, r.url, r.epoch) for r in eng.crawl_order.collect()]
    want = [(s, u, e) for (s, u, e, _h) in oracle.crawl_order]
    assert len(got) > 8, "exemplar crawl should still expand"
    assert got == want
    assert {r.url for r in eng.url_seen.collect()} == oracle.url_seen

    # the sampling evidence table matches row for row
    got_samples = [
        (r.epoch, r.src_url, r.src_xpath, r.url, r.cluster_id, r.exemplar,
         r.is_leaf)
        for r in eng.samples.collect()
    ]
    want_samples = sorted(
        (s["epoch"], s["src_url"], s["src_xpath"], s["url"], s["cluster_id"],
         s["exemplar"], s["is_leaf"])
        for s in oracle.samples
    )
    assert got_samples == want_samples
    assert got_samples, "no samples recorded"

    # non-vacuous clustering: some cluster holds >1 member (a sibling was
    # pruned) AND some group splits into >1 cluster (not one blob)
    from collections import Counter

    by_cluster = Counter(
        (s[1], s[2], s[4]) for s in want_samples if s[4] >= 0
    )
    assert any(n > 1 for n in by_cluster.values()), "all clusters singleton"
    by_group = Counter((s[1], s[2]) for s in want_samples if s[4] >= 0)
    multi = [
        g for g, n in by_group.items()
        if len({c for (su, xp, c) in by_cluster if (su, xp) == g}) > 1
    ]
    assert multi, "every group collapsed into one cluster"

    # exemplar crawl genuinely diverges from (and is smaller than) the
    # full-BFS crawl at the same horizon — the sample-efficiency claim
    full = crawl_oracle(cfg, seeds, robots_rows(cfg), max_epochs=4,
                        epoch_ms=10000)
    assert len(oracle.crawl_order) < len(full.crawl_order)

    # every sampled-but-not-exemplar url is seen yet never crawled
    crawled = {u for (_s, u, _e, _h) in oracle.crawl_order}
    pruned = [s for s in want_samples if s[4] >= 0 and not s[5]]
    assert pruned, "no sibling was ever pruned"
    for s in pruned:
        assert s[3] in oracle.url_seen
        assert s[3] not in crawled


def test_exemplar_resume_keeps_samples(spark, web, tmp_path):
    """The samples append table survives checkpoint resume."""
    cfg, corpus, robots = web
    seeds = seed_urls(cfg, 3)
    ck = str(tmp_path / "ck_res")
    base = dict(epoch_ms=10000, exemplar_sampling=True,
                exemplar_cosine_threshold=THRESH, checkpoint_dir=ck)
    eng = CrawlEngine(spark, corpus, robots,
                      EngineConfig(max_epochs=2, **base))
    eng.run(seeds)
    n_before = eng.samples.count()
    assert n_before > 0
    cont = CrawlEngine(spark, corpus, robots,
                       EngineConfig(max_epochs=4, **base))
    cont.resume()
    cont.run()
    assert cont.samples.count() >= n_before
    oracle = crawl_oracle(
        cfg, seeds, robots_rows(cfg), max_epochs=4, epoch_ms=10000,
        exemplar_sampling=True, exemplar_threshold=THRESH,
    )
    got = [(r.seq, r.url, r.epoch) for r in cont.crawl_order.collect()]
    assert got == [(s, u, e) for (s, u, e, _h) in oracle.crawl_order]


def test_cli_exemplar_crawl_and_learn(spark, tmp_path, capsys):
    """crawl --exemplar → learn-model e2e: the exemplar crawl commits a
    samples table, and learn-model's labeling evidence includes the
    sampled (downloaded-but-not-expanded) pages, as the reference's
    :corpus/:leaf-paths evidence does (crawl.clj:605-624)."""
    import json as _json

    from crawler_spark import cli
    from crawler_spark.engine import read_state_tables

    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text("http://host0.test/p/0/img-42-00000000\n"
                          "http://host1.test/p/7/img-42-00000111\n")
    ck = tmp_path / "ck"
    assert cli.main([
        "crawl", "--seeds", str(seeds_file), "--checkpoint", str(ck),
        "--synth-pages", "400", "--synth-hosts", "10",
        "--epochs", "3", "--epoch-ms", "10000",
        "--exemplar", "--exemplar-threshold", "0.8",
    ]) == 0
    capsys.readouterr()
    tables = read_state_tables(spark, str(ck), ["samples", "crawl_order"])
    n_samples = tables["samples"].count()
    assert n_samples > 0, "exemplar crawl committed no samples"
    crawled = {r.url for r in tables["crawl_order"].collect()}
    sampled = {r.url for r in tables["samples"].collect()}
    assert sampled - crawled, "no sample was pruned from expansion"

    model_path = tmp_path / "model.json"
    assert cli.main([
        "learn-model", "--checkpoint", str(ck),
        "--synth-pages", "400", "--synth-hosts", "10",
        "--out", str(model_path),
    ]) == 0
    model = _json.loads(model_path.read_text())
    assert model["leaf_xpath_freqs"], "no leaf evidence learned"
