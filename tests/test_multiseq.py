"""Multi-action-sequence budgeted model execution (reference
execute-model-budget-crawler, main.clj:247-305 + execute.clj:50-86):
ranked sequences fold through successive depth-indexed engine runs
under ONE shared page budget. Gates: exact crawl-order + URL-seen
parity per sequence vs the sequential oracle, a budget that stops
sequence 2 mid-plan, and a sequence skipped outright once the budget
is exhausted."""

import os

import pytest

from crawler_spark.engine import CrawlEngine, EngineConfig
from crawler_spark.multiseq import execute_model_budget, plan_model
from crawler_spark.oracle import crawl_oracle, multiseq_oracle
from crawler_spark.schema import ROBOTS_SCHEMA
from crawler_spark.synth import (
    XPATHS, SynthConfig, corpus_df, robots_rows, seed_urls,
)


def test_plan_model_ordering():
    """plan-model sorts by (length asc, yield desc), tie-break on the
    actions tuple (execute.clj:10-17)."""
    seqs = [
        (("a", "b"), 10),
        (("z",), 1),
        (("a",), 5),
        (("b",), 5),
        (("c", "d", "e"), 99),
    ]
    assert plan_model(seqs) == [
        ("a",), ("b",), ("z",), ("a", "b"), ("c", "d", "e"),
    ]


@pytest.fixture(scope="module")
def web(spark):
    cfg = SynthConfig(n_pages=400, n_hosts=8, with_images=False)
    corpus = corpus_df(spark, cfg).persist()
    corpus.count()
    robots = spark.createDataFrame(robots_rows(cfg), ROBOTS_SCHEMA)
    yield cfg, corpus, robots
    corpus.unpersist()


def test_multiseq_budget_parity(spark, web, tmp_path):
    cfg, corpus, robots = web
    seeds = seed_urls(cfg, 4)
    paging = tuple(XPATHS[3:5])
    planned = plan_model([
        ((XPATHS[0], XPATHS[2]), 40),
        ((XPATHS[1], XPATHS[0], XPATHS[2]), 90),
        ((XPATHS[2], XPATHS[1]), 10),
    ])
    # plan 1 is the shorter 2-step seq with the higher yield
    assert planned[0] == (XPATHS[0], XPATHS[2])
    assert planned[1] == (XPATHS[2], XPATHS[1])

    # budget chosen FROM the unbudgeted oracle runs so the test adapts
    # to the web: all of seq 1 + half of seq 2 → seq 2 stops mid-plan,
    # seq 3 is skipped outright
    free = [
        crawl_oracle(
            cfg, seeds, robots_rows(cfg), max_epochs=6, epoch_ms=8000,
            model_action_seq=list(a), paging_xpaths=set(paging),
        )
        for a in planned
    ]
    v1, v2 = len(free[0].crawl_order), len(free[1].crawl_order)
    assert v1 > 4 and v2 > 8, "web too small for a meaningful budget test"
    budget = v1 + v2 // 2

    res = execute_model_budget(
        spark, corpus, robots, seeds, planned, paging,
        budget=budget, checkpoint_root=str(tmp_path / "ms"),
        max_epochs=6, epoch_ms=8000,
    )
    want_runs, want_spent = multiseq_oracle(
        cfg, seeds, robots_rows(cfg), planned, budget,
        paging_xpaths=set(paging), max_epochs=6, epoch_ms=8000,
    )

    # sequence 1 runs to completion under a budget that can't stop it
    assert not res.runs[0].skipped
    assert res.runs[0].max_pages == budget
    assert res.runs[0].visited == v1

    # sequence 2 starts from sequence 1's depleted budget and is stopped
    # mid-plan by it (visited < the unbudgeted run's count, but it
    # crossed the remaining budget before stopping)
    assert res.runs[1].max_pages == budget - v1 == v2 // 2
    assert res.runs[1].visited >= v2 // 2
    assert res.runs[1].visited < v2, "budget did not bite — web too small"

    # sequence 3 never launches: the budget is spent
    assert res.runs[2].skipped
    assert res.runs[2].visited == 0
    assert not os.path.exists(str(tmp_path / "ms" / "seq-002"))

    assert res.budget_spent == want_spent

    # exact per-sequence parity: crawl order + URL-seen
    for i, (run, want) in enumerate(zip(res.runs, want_runs)):
        if want is None:
            assert run.skipped
            continue
        got_order = [(r.seq, r.url, r.epoch) for r in run.crawl_order.collect()]
        want_order = [(s, u, e) for (s, u, e, _h) in want.crawl_order]
        assert got_order == want_order, f"sequence {i} order diverged"
        assert {r.url for r in run.url_seen.collect()} == want.url_seen

    # the combined view tags every row with its plan index
    combined = res.crawl_order()
    by_plan = {
        r.plan_idx: r.n
        for r in combined.groupBy("plan_idx").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert by_plan == {0: res.runs[0].visited, 1: res.runs[1].visited}


def test_multiseq_zero_budget_skips_everything(spark, web, tmp_path):
    cfg, corpus, robots = web
    res = execute_model_budget(
        spark, corpus, robots, seed_urls(cfg, 2),
        [(XPATHS[0],), (XPATHS[1],)], (), budget=0,
        checkpoint_root=str(tmp_path / "z"), max_epochs=3, epoch_ms=8000,
    )
    assert all(r.skipped for r in res.runs)
    assert res.budget_spent == 0
    assert res.crawl_order() is None
