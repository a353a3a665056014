"""Feature-interaction parity gates (round-5): the round-4 modes
composed, each against the sequential oracle.

(a) exemplar-cluster sampling × recrawl-TTL (cuckoo): TTL expiry
    re-admits already-crawled urls into LATER epochs' exemplar sampling
    groups — expiry, fingerprint deletes, and the sampling prune must
    compose without drift.
(b) multiseq shared budget × :avoid refinement: a learned refinement
    that changes a later sequence's visited count must shift the budget
    arithmetic identically on both sides.
"""

import re

import pytest

from crawler_spark.engine import CrawlEngine, EngineConfig
from crawler_spark.multiseq import execute_model_budget, plan_model
from crawler_spark.oracle import crawl_oracle, multiseq_oracle
from crawler_spark.schema import ROBOTS_SCHEMA
from crawler_spark.synth import (
    XPATHS, SynthConfig, corpus_df, robots_rows, seed_urls,
)


@pytest.fixture(scope="module")
def web(spark):
    # 600/8 with ttl=1 over 8 epochs measured non-vacuous on the oracle:
    # 32 TTL re-crawls, 39 sampled-and-pruned urls, 6 urls BOTH pruned
    # and later re-sampled (the interaction the gate exists for)
    cfg = SynthConfig(n_pages=600, n_hosts=8, with_images=False)
    corpus = corpus_df(spark, cfg).persist()
    corpus.count()
    robots = spark.createDataFrame(robots_rows(cfg), ROBOTS_SCHEMA)
    yield cfg, corpus, robots
    corpus.unpersist()


def test_exemplar_with_ttl_cuckoo_parity(spark, web, tmp_path):
    """Exemplar sampling + TTL expiry (cuckoo fingerprint deletes) in
    one run: exact crawl-order, URL-seen, AND samples-table parity."""
    cfg, corpus, robots = web
    seeds = seed_urls(cfg, 5)
    kw = dict(max_epochs=8, epoch_ms=8000, recrawl_ttl_epochs=1,
              exemplar_sampling=True)
    oracle = crawl_oracle(cfg, seeds, robots_rows(cfg),
                          exemplar_threshold=0.8, **kw)
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(
            checkpoint_dir=str(tmp_path / "ck"), n_seen_buckets=8,
            seen_filter="cuckoo", exemplar_cosine_threshold=0.8, **kw,
        ),
    )
    eng.run(seeds)
    got = [(r.seq, r.url, r.epoch) for r in eng.crawl_order.collect()]
    want = [(s, u, e) for (s, u, e, _h) in oracle.crawl_order]
    assert len(got) > 30
    assert got == want
    assert {r.url for r in eng.url_seen.collect()} == oracle.url_seen
    got_samples = sorted(
        (r.epoch, r.src_url, r.src_xpath, r.url, r.cluster_id, r.exemplar)
        for r in eng.samples.collect()
    )
    want_samples = sorted(
        (d["epoch"], d["src_url"], d["src_xpath"], d["url"],
         d["cluster_id"], d["exemplar"])
        for d in oracle.samples
    )
    assert got_samples == want_samples

    # non-vacuous interaction: TTL actually re-crawled something (a url
    # at two seqs) AND the sampling actually pruned something (a sampled
    # non-exemplar) — and at least one url did BOTH: pruned from the
    # frontier by sampling in one epoch, yet present in a later epoch's
    # sampling evidence again after TTL re-opened its seen slot
    urls = [u for (_s, u, _e) in got]
    assert len(urls) > len(set(urls)), "TTL never re-admitted a url"
    pruned = {
        d["url"] for d in oracle.samples
        if not d["exemplar"] and d["cluster_id"] >= 0
    }
    assert pruned, "exemplar sampling never pruned"
    by_url_epochs = {}
    for d in oracle.samples:
        by_url_epochs.setdefault(d["url"], set()).add(d["epoch"])
    resampled = {u for u, es in by_url_epochs.items() if len(es) > 1}
    assert resampled & pruned, (
        "no pruned url ever re-entered a later sampling round — the "
        "TTL×exemplar interaction is vacuous on this web"
    )


def test_multiseq_with_refinement_parity(spark, web, tmp_path):
    """Shared-budget multiseq where an :avoid refinement changes a
    sequence's visited count — budget arithmetic and per-sequence crawl
    order must match the oracle exactly, and the refinement must be
    non-vacuous (different visited counts vs the unrefined fold)."""
    cfg, corpus, robots = web
    seeds = seed_urls(cfg, 4)
    paging = tuple(XPATHS[3:5])
    planned = plan_model([
        ((XPATHS[0], XPATHS[2]), 40),
        ((XPATHS[1], XPATHS[0], XPATHS[2]), 90),
    ])

    # derive a refinement that provably bites: from sequence 1's
    # unrefined oracle run, avoid the image-id token of a mid-run page
    # reached via a content hop (its xpath = last path element)
    free1 = crawl_oracle(
        cfg, seeds, robots_rows(cfg), max_epochs=6, epoch_ms=8000,
        model_action_seq=list(planned[1]), paging_xpaths=set(paging),
    )
    target = None
    for (seq, url, _e, _h), path in zip(
        free1.crawl_order, free1.crawl_paths
    ):
        if seq >= len(seeds) and path:
            toks = [t for t in re.sub(r"^[a-zA-Z]+://[^/]*/", "", url).split("/") if t]
            if toks:
                target = (path[-1], toks[-1])
                break
    assert target, "no refinable hop realized"
    refine_avoid = ((target[0], (target[1],)),)

    budget = len(free1.crawl_order) * 2  # roomy: refinement, not budget, bites seq 2
    kw = dict(max_epochs=6, epoch_ms=8000)
    want_runs, want_spent = multiseq_oracle(
        cfg, seeds, robots_rows(cfg), planned, budget,
        paging_xpaths=set(paging),
        refine_avoid={xp: set(av) for xp, av in refine_avoid}, **kw,
    )
    res = execute_model_budget(
        spark, corpus, robots, seeds, planned, paging,
        budget=budget, checkpoint_root=str(tmp_path / "ms"),
        refine_avoid=refine_avoid, n_seen_buckets=8, **kw,
    )
    assert res.budget_spent == want_spent
    for i, (run, want) in enumerate(zip(res.runs, want_runs)):
        if want is None:
            assert run.skipped
            continue
        got_order = [(r.seq, r.url, r.epoch) for r in run.crawl_order.collect()]
        assert got_order == [(s, u, e) for (s, u, e, _h) in want.crawl_order], (
            f"sequence {i} diverged under refinement"
        )
        assert {r.url for r in run.url_seen.collect()} == want.url_seen

    # non-vacuous: the refinement changed the refined sequence's crawl
    unref_runs, unref_spent = multiseq_oracle(
        cfg, seeds, robots_rows(cfg), planned, budget,
        paging_xpaths=set(paging), **kw,
    )
    refined_orders = [
        [u for (_s, u, _e, _h) in r.crawl_order] if r else None
        for r in want_runs
    ]
    unref_orders = [
        [u for (_s, u, _e, _h) in r.crawl_order] if r else None
        for r in unref_runs
    ]
    assert refined_orders != unref_orders, "refinement never bit"
    assert want_spent != unref_spent or refined_orders != unref_orders
