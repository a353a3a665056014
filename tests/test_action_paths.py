"""Action-path tracking → learned action sequences → CLI multiseq.

The reference keeps each URL's src-path (the xpath sequence that reached
it, crawl.clj:200-202); the learned model's :actions key is the
frequency map of these per leaf page (crawl.clj:108), and
execute-model's budget loop plans over THOSE sequences
(main.clj:247-305). Round 4 carries the same path on every frontier /
crawl_order row (content hops append their src_xpath, paging hops keep
the parent's — len(path) == depth), learn-model emits the per-leaf
path frequencies as model JSON ``action_seqs``, and
``execute-model --multiseq --budget N`` runs them through the shared-
budget loop. Gates: exact path parity vs the sequential oracle in both
plain and harvest modes, and a CLI learn→multiseq e2e whose ledger
matches ``multiseq_oracle`` run for run."""

import json

import pytest

from crawler_spark import cli
from crawler_spark.engine import CrawlEngine, EngineConfig
from crawler_spark.oracle import crawl_oracle, multiseq_oracle
from crawler_spark.schema import ROBOTS_SCHEMA
from crawler_spark.synth import (
    XPATHS, SynthConfig, corpus_df, robots_rows, seed_urls,
)


@pytest.fixture(scope="module")
def web(spark):
    cfg = SynthConfig(n_pages=400, n_hosts=8, with_images=False)
    corpus = corpus_df(spark, cfg).persist()
    corpus.count()
    robots = spark.createDataFrame(robots_rows(cfg), ROBOTS_SCHEMA)
    yield cfg, corpus, robots
    corpus.unpersist()


def _paths(eng, oracle):
    got = [(r.seq, r.url, tuple(r.path)) for r in eng.crawl_order.collect()]
    want = [
        (s, u, p)
        for ((s, u, _e, _h), p) in zip(oracle.crawl_order, oracle.crawl_paths)
    ]
    return got, want


def test_path_parity_plain(spark, web, tmp_path):
    cfg, corpus, robots = web
    seeds = seed_urls(cfg, 4)
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(max_epochs=4, epoch_ms=10000,
                     checkpoint_dir=str(tmp_path / "ck_plain")),
    )
    eng.run(seeds)
    oracle = crawl_oracle(cfg, seeds, robots_rows(cfg), max_epochs=4,
                          epoch_ms=10000)
    got, want = _paths(eng, oracle)
    assert got == want
    # non-vacuous: seeds have empty paths, deeper pages multi-hop ones
    assert any(p == () for _s, _u, p in got)
    assert any(len(p) > 1 for _s, _u, p in got)


def test_path_parity_harvest_paging_keeps_parent_path(spark, web, tmp_path):
    """Harvest mode exercises the paging queue: a page reached via a
    paging hop keeps the PARENT's path (crawl.clj:525-528), so
    len(path) == depth even across pagination chains."""
    cfg, corpus, robots = web
    seeds = seed_urls(cfg, 4)
    actions = (XPATHS[0], XPATHS[1], XPATHS[2])
    paging = (XPATHS[3], XPATHS[4])
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(max_epochs=5, epoch_ms=10000,
                     checkpoint_dir=str(tmp_path / "ck_harvest"),
                     model_xpaths=actions, paging_xpaths=paging,
                     leaf_limit=200),
    )
    eng.run(seeds)
    oracle = crawl_oracle(
        cfg, seeds, robots_rows(cfg), max_epochs=5, epoch_ms=10000,
        model_xpaths=set(actions), paging_xpaths=set(paging), leaf_limit=200,
    )
    got, want = _paths(eng, oracle)
    assert got == want
    # a paging hop happened and its path stayed at the parent's length:
    # every path contains only CONTENT action xpaths, never a paging one
    assert all(
        all(x not in paging for x in p) for _s, _u, p in got
    ), "a paging xpath leaked into an action path"
    assert any(len(p) > 1 for _s, _u, p in got)


def test_learn_model_emits_action_seqs_and_multiseq_runs(
    spark, tmp_path, capsys
):
    """crawl → learn-model → execute-model --multiseq e2e: the model
    carries per-leaf action-path frequencies, and the budget loop's
    ledger (launched budgets, visited counts, skips, budget_spent)
    matches the sequential multiseq oracle exactly."""
    from crawler_spark.multiseq import plan_model

    n_pages, n_hosts = 300, 10
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text("http://host0.test/p/0/img-42-00000000\n")
    ck = tmp_path / "ck"
    assert cli.main([
        "crawl", "--seeds", str(seeds_file), "--checkpoint", str(ck),
        "--synth-pages", str(n_pages), "--synth-hosts", str(n_hosts),
        "--epochs", "3", "--epoch-ms", "8000",
    ]) == 0
    capsys.readouterr()
    model_path = tmp_path / "model.json"
    assert cli.main([
        "learn-model", "--checkpoint", str(ck),
        "--synth-pages", str(n_pages), "--synth-hosts", str(n_hosts),
        "--out", str(model_path),
    ]) == 0
    capsys.readouterr()
    model = json.loads(model_path.read_text())
    raw_seqs = model["action_seqs"]
    assert raw_seqs, "no action sequences learned"
    assert all(s["actions"] and s["yield"] > 0 for s in raw_seqs)
    assert any(len(s["actions"]) > 1 for s in raw_seqs), "only 1-hop plans"

    # fix-model carries action_seqs through, dropping pagination-
    # shadowed plans (remove-pagination-from-actions analog) — the
    # reference runs fix-model as execute-model's mandatory first step
    fixed_path = tmp_path / "fixed.json"
    assert cli.main([
        "fix-model", "--model", str(model_path),
        "--checkpoint", str(ck),
        "--synth-pages", str(n_pages), "--synth-hosts", str(n_hosts),
        "--out", str(fixed_path),
    ]) == 0
    capsys.readouterr()
    fixed = json.loads(fixed_path.read_text())
    seqs = fixed["action_seqs"]
    assert seqs, "fix-model dropped every action sequence"
    # the strip rule restated (reference remove-pagination-from-actions,
    # corpus.clj:417-437): with a learned per-source paging model, a plan
    # is shadowed iff its chronological prefix equals some src-seq +
    # [paging-action] AND its refinement (keyed by its final action)
    # equals that entry's {:only :avoid}; a pure-pagination plan that no
    # per-source entry matches SURVIVES, as in the reference. Only
    # pre-paging-model JSONs fall back to the global-set collapse. The
    # rule's own correctness is hash-gated by the fix_model_seqs oracle;
    # this pins the e2e wiring.
    pm = fixed.get("paging_model", [])
    if pm:
        orig_ref = {
            r["xpath"]: (sorted(r.get("only", [])), sorted(r.get("avoid", [])))
            for r in model.get("refinements", [])
        }

        def _shadowed(s):
            acts = list(s["actions"])
            plan_ref = orig_ref.get(acts[-1], ([], [])) if acts else ([], [])
            return any(
                acts[: len(e["action_seq"]) + 1]
                == list(e["action_seq"]) + [e["paging_xpath"]]
                and plan_ref
                == (sorted(e.get("only", [])), sorted(e.get("avoid", [])))
                for e in pm
            )

        expect = [s for s in raw_seqs if not _shadowed(s)]
    else:
        paging_set = {
            r["src_xpath"] for r in fixed.get("pagination_xpaths", [])
            if r.get("src_xpath")
        }
        expect = [
            s for s in raw_seqs
            if not all(a in paging_set for a in s["actions"])
        ]
    assert seqs == expect

    budget = 12  # forces a mid-plan stop and (with several plans) skips
    ck2 = tmp_path / "ck2"
    assert cli.main([
        "execute-model", "--model", str(fixed_path),
        "--seeds", str(seeds_file), "--checkpoint", str(ck2),
        "--synth-pages", str(n_pages), "--synth-hosts", str(n_hosts),
        "--epochs", "4", "--epoch-ms", "8000",
        "--multiseq", "--budget", str(budget),
        "--harvest-budget", "200", "--no-refine",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["budget"] == budget
    assert out["budget_spent"] == sum(r["visited"] for r in out["runs"])
    assert len(out["runs"]) == len(seqs)

    # ledger parity vs the sequential restatement, run for run
    cfg = SynthConfig(n_pages=n_pages, n_hosts=n_hosts, with_images=False)
    planned = plan_model([(tuple(s["actions"]), s["yield"]) for s in seqs])
    assert [tuple(r["actions"]) for r in out["runs"]] == planned
    # mirror the CLI's paging wiring: a learned per-source paging model
    # REPLACES the global paging-xpath set at execution (cli.py
    # cmd_execute_model) — the oracle must follow or it chases one paging
    # hop the engine's refinement drops (or vice versa)
    paging = tuple(
        r["src_xpath"] for r in fixed.get("pagination_xpaths", [])
        if r.get("src_xpath")
    )
    pm_oracle = {
        tuple(e["action_seq"]): (
            e["paging_xpath"], tuple(e.get("only", [])),
            tuple(e.get("avoid", [])),
        )
        for e in pm
    }
    if pm_oracle:
        paging = ()
    want_runs, want_spent = multiseq_oracle(
        cfg, ["http://host0.test/p/0/img-42-00000000"], robots_rows(cfg),
        planned, budget, paging_xpaths=set(paging),
        paging_model=pm_oracle or None,
        max_epochs=4, epoch_ms=8000, leaf_limit=200,
    )
    assert out["budget_spent"] == want_spent
    for got_r, want_r in zip(out["runs"], want_runs):
        if want_r is None:
            assert got_r["skipped"] and got_r["visited"] == 0
        else:
            assert not got_r["skipped"]
            assert got_r["visited"] == len(want_r.crawl_order)
    # non-vacuous: the budget actually bit — some sequence was skipped
    # or stopped short of its free-run size
    assert any(r["skipped"] for r in out["runs"]) or (
        out["budget_spent"] >= budget
    )
