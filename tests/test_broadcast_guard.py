"""Size-guarded epoch-batch broadcasts (the 10^10-design-point ceiling
fix): every join whose build side derives from the quota-bounded
selected batch broadcasts only under ``EngineConfig.broadcast_max_rows``
and falls back to a shuffle-hash hint above it. Semantics must be
strategy-independent — a forced-tiny threshold run must stay in EXACT
parity with the sequential oracle — and the fallback plan must actually
drop the broadcast. Also gates the checkpoint format stamp (a
pre-path-column manifest must fail loudly, not learn empty models)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine import CrawlEngine, EngineConfig
from crawler_spark.oracle import crawl_oracle
from crawler_spark.schema import ROBOTS_SCHEMA
from crawler_spark.synth import SynthConfig, corpus_df, robots_rows, seed_urls


@pytest.fixture(scope="module")
def web(spark):
    # aliases on: exercises the alias-map/keys/prev_hits/closure joins,
    # the exemplar-free batch joins, and the TTL-free fetch join
    cfg = SynthConfig(n_pages=500, n_hosts=10, with_images=False)
    corpus = corpus_df(spark, cfg).persist()
    corpus.count()
    robots = spark.createDataFrame(robots_rows(cfg), ROBOTS_SCHEMA)
    return cfg, corpus, robots


def test_fallback_parity_exact(spark, web, tmp_path):
    """broadcast_max_rows=0 forces EVERY epoch-batch join onto the
    shuffle-hash fallback — crawl order, URL-seen, and metrics must be
    bit-identical to the sequential oracle (and hence to the default
    broadcast plan, which the standard parity suite gates)."""
    cfg, corpus, robots = web
    seeds = seed_urls(cfg, 5)
    oracle = crawl_oracle(cfg, seeds, robots_rows(cfg), max_epochs=4,
                          epoch_ms=8000)
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(
            max_epochs=4, epoch_ms=8000, checkpoint_dir=str(tmp_path / "ck"),
            n_seen_buckets=8, bloom_m_bits=1 << 16,
            broadcast_max_rows=0,
        ),
    )
    eng.run(seeds)
    got = [(r.seq, r.url, r.epoch) for r in eng.crawl_order.collect()]
    want = [(s, u, e) for (s, u, e, _h) in oracle.crawl_order]
    assert len(got) > 50
    assert got == want
    assert {r.url for r in eng.url_seen.collect()} == oracle.url_seen


def test_fallback_plan_has_no_broadcast(spark, web, tmp_path):
    """The guard's fallback plan: the fetch-join shape with an
    over-threshold batch side must analyze to a ShuffledHashJoin, not a
    BroadcastHashJoin (on a cluster the corpus side is bucketed by url,
    so only the batch shuffles; locally both sides exchange)."""
    from crawler_spark.plans import explain_str

    cfg, corpus, robots = web
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(checkpoint_dir=str(tmp_path / "ck2"),
                     broadcast_max_rows=10),
    )
    batch = corpus.limit(50).select("url")
    plan = explain_str(corpus.join(eng._bcast(batch, 50), "url", "inner"))
    assert "BroadcastHashJoin" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan
    # under the threshold the default broadcast shape is untouched
    plan2 = explain_str(corpus.join(eng._bcast(batch, 9), "url", "inner"))
    assert "BroadcastHashJoin" in plan2, plan2


def test_robots_fallback_plan_has_no_broadcast(spark, web, tmp_path):
    """The robots table is per-host (10^7-10^8 rows at the design
    point): with bcast=False both per-host robots joins must hash the
    robots side instead of broadcasting it. The broadcast_max_rows=0
    parity test above already proves the fallback's SEMANTICS (the
    engine routes its cached robots-count decision through the same
    flag); this pins the PLAN."""
    from crawler_spark import politeness
    from crawler_spark.plans import explain_str

    cfg, corpus, robots = web
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(checkpoint_dir=str(tmp_path / "ckr"),
                     broadcast_max_rows=0),
    )
    eng.init_seeds(seed_urls(cfg, 5))
    frontier = eng._state["frontier"]
    flagged = politeness.with_disallowed_flag(frontier, robots, bcast=False)
    plan = explain_str(flagged)
    assert "BroadcastHashJoin" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan
    sel, rest = politeness.dequeue(
        flagged.filter(~F.col("__disallowed")).drop("__disallowed"),
        robots, epoch_ms=8000, approx_rows=5, bcast=False,
    )
    plan2 = explain_str(sel)
    assert "BroadcastHashJoin" not in plan2, plan2
    # default path untouched: bcast=True still broadcasts
    plan3 = explain_str(
        politeness.with_disallowed_flag(frontier, robots, bcast=True)
    )
    assert "BroadcastHashJoin" in plan3, plan3


def test_track_paths_off_keeps_order_parity(spark, web, tmp_path):
    """track_paths=False (the throughput config) skips the survivor
    re-attach join and writes empty path arrays — crawl order, URL-seen,
    and schema must be unchanged; only the path payload goes empty."""
    cfg, corpus, robots = web
    seeds = seed_urls(cfg, 5)
    oracle = crawl_oracle(cfg, seeds, robots_rows(cfg), max_epochs=3,
                          epoch_ms=8000)
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(
            max_epochs=3, epoch_ms=8000, checkpoint_dir=str(tmp_path / "ck3"),
            n_seen_buckets=8, bloom_m_bits=1 << 16,
            track_paths=False,
        ),
    )
    eng.run(seeds)
    got = [(r.seq, r.url) for r in eng.crawl_order.collect()]
    assert got == [(s, u) for (s, u, _e, _h) in oracle.crawl_order]
    assert {r.url for r in eng.url_seen.collect()} == oracle.url_seen
    # schema intact, payload empty
    rows = eng.crawl_order.select("path").collect()
    assert all(r.path == [] for r in rows)


def test_pre_path_checkpoint_rejected(spark, web, tmp_path):
    """A manifest without the format stamp (pre-path-column checkpoint)
    must fail resume AND read_state_tables with the re-crawl message —
    not resume into missing columns or learn empty action_seqs."""
    from crawler_spark.engine import read_state_tables

    cfg, corpus, robots = web
    seeds = seed_urls(cfg, 5)
    ck = tmp_path / "old"
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(max_epochs=2, epoch_ms=8000, checkpoint_dir=str(ck),
                     n_seen_buckets=8, bloom_m_bits=1 << 16),
    )
    eng.run(seeds)
    # strip the stamp from the latest manifest → simulated old checkpoint
    snaps = sorted(x for x in os.listdir(ck) if x.startswith("snap-"))
    mpath = os.path.join(ck, snaps[-1], "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    del manifest["format"]
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    fresh = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(checkpoint_dir=str(ck), n_seen_buckets=8),
    )
    with pytest.raises(ValueError, match="format"):
        fresh.resume()
    with pytest.raises(ValueError, match="format"):
        read_state_tables(spark, str(ck), ["crawl_order"])
