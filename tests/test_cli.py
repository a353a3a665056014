"""CLI (spark-submit entry point): crawl + resume + learn-model,
driven through crawler_spark.cli.main (getOrCreate reuses the test
session)."""

import json
import os

from crawler_spark import cli


def test_cli_crawl_and_model(spark, tmp_path, capsys):
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text(
        "# comment line\n"
        "http://host0.test/p/0/img-42-00000000\n"
        "\n"
        "http://host1.test/p/7/img-42-00000111\n"
    )
    ck = tmp_path / "ck"
    rc = cli.main(
        [
            "crawl",
            "--seeds", str(seeds_file),
            "--checkpoint", str(ck),
            "--synth-pages", "300",
            "--synth-hosts", "10",
            "--epochs", "2",
            "--epoch-ms", "8000",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["manifest"]["dequeue_seq"] > 0
    assert len(out["metrics"]) == 2
    assert any(x.startswith("snap-") for x in os.listdir(ck))

    # resume continues from the snapshot
    rc = cli.main(
        [
            "crawl",
            "--seeds", str(seeds_file),
            "--checkpoint", str(ck),
            "--synth-pages", "300",
            "--synth-hosts", "10",
            "--epochs", "3",
            "--epoch-ms", "8000",
            "--resume",
        ]
    )
    assert rc == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["manifest"]["epoch"] == 2
    assert out2["manifest"]["dequeue_seq"] >= out["manifest"]["dequeue_seq"]

    model_path = tmp_path / "model.json"
    rc = cli.main(
        [
            "learn-model",
            "--checkpoint", str(ck),
            "--synth-pages", "300",
            "--synth-hosts", "10",
            "--out", str(model_path),
        ]
    )
    assert rc == 0
    model = json.loads(model_path.read_text())
    assert len(model["leaf_xpath_freqs"]) > 0
    freqs = [x["freq"] for x in model["leaf_xpath_freqs"]]
    assert freqs == sorted(freqs, reverse=True)
    # learned refinement rides the model JSON (possibly empty on webs
    # where no URL path token separates fat from muscle, but always
    # present and well-formed)
    assert "refinements" in model
    for r in model["refinements"]:
        assert set(r) >= {"xpath", "avoid"}


def test_cli_execute_model(spark, tmp_path, capsys):
    """crawl → learn-model → execute-model end-to-end: the harvest run
    follows only the model's xpath actions and stops at the leaf budget."""
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text("http://host0.test/p/0/img-42-00000000\n")
    ck = tmp_path / "ck"
    assert cli.main([
        "crawl", "--seeds", str(seeds_file), "--checkpoint", str(ck),
        "--synth-pages", "300", "--synth-hosts", "10",
        "--epochs", "3", "--epoch-ms", "8000",
    ]) == 0
    capsys.readouterr()
    model_path = tmp_path / "model.json"
    assert cli.main([
        "learn-model", "--checkpoint", str(ck),
        "--synth-pages", "300", "--synth-hosts", "10",
        "--out", str(model_path),
    ]) == 0
    capsys.readouterr()
    ck2 = tmp_path / "ck2"
    assert cli.main([
        "execute-model", "--model", str(model_path),
        "--seeds", str(seeds_file), "--checkpoint", str(ck2),
        "--synth-pages", "300", "--synth-hosts", "10",
        "--epochs", "4", "--epoch-ms", "8000",
        "--top-actions", "2", "--harvest-budget", "20",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["actions"]) == 2
    assert out["harvested_leaves"] >= 0
    assert out["manifest"]["dequeue_seq"] > 0


def test_execute_model_parity(spark, tmp_path):
    """The harvest automaton must match the sequential oracle exactly
    under the same model (actions + pagination xpaths) and leaf budget."""
    from crawler_spark.engine import CrawlEngine, EngineConfig
    from crawler_spark.oracle import crawl_oracle
    from crawler_spark.schema import ROBOTS_SCHEMA
    from crawler_spark.synth import (
        XPATHS, SynthConfig, corpus_df, robots_rows, seed_urls,
    )

    cfg = SynthConfig(n_pages=400, n_hosts=8, with_images=False)
    corpus = corpus_df(spark, cfg).persist()
    corpus.count()
    robots = spark.createDataFrame(robots_rows(cfg), ROBOTS_SCHEMA)
    seeds = seed_urls(cfg, 4)
    actions = tuple(XPATHS[:3])
    paging = tuple(XPATHS[3:5])
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(max_epochs=4, epoch_ms=8000, leaf_limit=60,
                     checkpoint_dir=str(tmp_path / "ck"),
                     model_xpaths=actions, paging_xpaths=paging),
    )
    eng.run(seeds)
    oracle = crawl_oracle(
        cfg, seeds, robots_rows(cfg), max_epochs=4, epoch_ms=8000,
        leaf_limit=60, model_xpaths=set(actions), paging_xpaths=set(paging),
    )
    got = [(r.seq, r.url, r.epoch) for r in eng.crawl_order.collect()]
    want = [(s, u, e) for (s, u, e, _h) in oracle.crawl_order]
    assert len(got) > 10, "harvest should actually expand"
    assert got == want
    assert {r.url for r in eng.url_seen.collect()} == oracle.url_seen
    fields = ["urls_scheduled", "pages_fetched", "links_extracted",
              "links_enqueued", "dups_dropped", "disallowed_dropped",
              "leaves_fetched", "neardup_fetched"]
    got_m = [tuple([r.epoch] + [getattr(r, f) for f in fields])
             for r in eng.metrics.collect()]
    want_m = [tuple([m["epoch"]] + [m[f] for f in fields]) for m in oracle.metrics]
    assert got_m == want_m
    # the model must actually bite: an unrestricted crawl enqueues more
    unrestricted = crawl_oracle(cfg, seeds, robots_rows(cfg), max_epochs=4,
                                epoch_ms=8000)
    assert len(oracle.url_seen) < len(unrestricted.url_seen)
    corpus.unpersist()


def test_execute_model_refinement_parity(spark, tmp_path):
    """Learned :avoid refinement (dom.clj:942-1061 applied in the E3
    loop crawl.clj:458-530): candidates whose href path contains an
    avoided token for their xpath are dropped before the seen check —
    engine and sequential oracle must agree exactly, and the avoid set
    must be non-vacuous (it changes the crawl)."""
    from crawler_spark.engine import CrawlEngine, EngineConfig
    from crawler_spark.oracle import crawl_oracle
    from crawler_spark.schema import ROBOTS_SCHEMA
    from crawler_spark.synth import (
        XPATHS, SynthConfig, corpus_df, robots_rows, seed_urls,
    )

    cfg = SynthConfig(n_pages=400, n_hosts=8, with_images=False)
    corpus = corpus_df(spark, cfg).persist()
    corpus.count()
    robots = spark.createDataFrame(robots_rows(cfg), ROBOTS_SCHEMA)
    seeds = seed_urls(cfg, 4)
    actions, paging = tuple(XPATHS[:3]), tuple(XPATHS[3:5])
    # avoid path-bucket tokens for two of the model's xpaths
    avoid = ((XPATHS[0], ("3", "5")), (XPATHS[1], ("2",)))
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(max_epochs=4, epoch_ms=8000, leaf_limit=60,
                     checkpoint_dir=str(tmp_path / "ck_ref"),
                     model_xpaths=actions, paging_xpaths=paging,
                     refine_avoid=avoid),
    )
    eng.run(seeds)
    oracle = crawl_oracle(
        cfg, seeds, robots_rows(cfg), max_epochs=4, epoch_ms=8000,
        leaf_limit=60, model_xpaths=set(actions), paging_xpaths=set(paging),
        refine_avoid={xp: set(av) for xp, av in avoid},
    )
    got = [(r.seq, r.url, r.epoch) for r in eng.crawl_order.collect()]
    want = [(s, u, e) for (s, u, e, _h) in oracle.crawl_order]
    assert len(got) > 10, "refined harvest should still expand"
    assert got == want
    assert {r.url for r in eng.url_seen.collect()} == oracle.url_seen
    # non-vacuous: the refinement must actually drop links
    unrefined = crawl_oracle(
        cfg, seeds, robots_rows(cfg), max_epochs=4, epoch_ms=8000,
        leaf_limit=60, model_xpaths=set(actions), paging_xpaths=set(paging),
    )
    assert oracle.url_seen != unrefined.url_seen, "avoid set never fired"
    corpus.unpersist()


def test_cli_fix_model(spark, tmp_path, capsys):
    """fix-model e2e (reference fix-model, main.clj:232-246): crawl →
    learn-model → tamper the model (a pagination-shadowed action + a
    stale :avoid token whose evidence flipped + a token never observed)
    → fix-model strips/drops exactly the bad parts, keeps the genuinely
    learned ones, and executing the FIXED model runs a different plan
    than executing the tampered model."""
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text("http://host0.test/p/0/img-42-00000000\n")
    ck = tmp_path / "ck"
    assert cli.main([
        "crawl", "--seeds", str(seeds_file), "--checkpoint", str(ck),
        "--synth-pages", "300", "--synth-hosts", "10",
        "--epochs", "3", "--epoch-ms", "8000",
    ]) == 0
    capsys.readouterr()
    model_path = tmp_path / "model.json"
    assert cli.main([
        "learn-model", "--checkpoint", str(ck),
        "--synth-pages", "300", "--synth-hosts", "10",
        "--out", str(model_path),
    ]) == 0
    capsys.readouterr()
    model = json.loads(model_path.read_text())
    assert model["pagination_xpaths"], "synth web grew no paging queue"
    paging_xp = model["pagination_xpaths"][0]["src_xpath"]
    # tamper 1: inject the paging xpath as the TOP content action —
    # pagination in disguise, exactly what the strip must remove
    top_freq = (model["leaf_xpath_freqs"][0]["freq"] + 100
                if model["leaf_xpath_freqs"] else 100)
    model["leaf_xpath_freqs"].insert(
        0, {"xpath": paging_xp, "freq": top_freq}
    )
    # tamper 2: a stale avoid token that the corpus shows in GOOD links
    # (evidence flipped) and one never observed — both must be dropped;
    # the genuinely learned tokens must survive the re-probe
    want_refs = {
        r["xpath"]: (sorted(r["only"]), sorted(r["avoid"]))
        for r in model["refinements"]
    }
    assert model["refinements"], "learned model carries no refinements"
    model["refinements"][0] = dict(model["refinements"][0])
    model["refinements"][0]["avoid"] = (
        list(model["refinements"][0]["avoid"]) + ["never-seen-tok"]
    )
    tampered = tmp_path / "tampered.json"
    tampered.write_text(json.dumps(model))

    fixed_path = tmp_path / "fixed.json"
    assert cli.main([
        "fix-model", "--model", str(tampered), "--checkpoint", str(ck),
        "--synth-pages", "300", "--synth-hosts", "10",
        "--out", str(fixed_path),
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["actions_stripped"] >= 1
    fixed = json.loads(fixed_path.read_text())
    assert fixed["fixed"] is True
    fixed_xps = [r["xpath"] for r in fixed["leaf_xpath_freqs"]]
    assert paging_xp not in fixed_xps, "shadowed action survived the strip"
    got_refs = {
        r["xpath"]: (sorted(r["only"]), sorted(r["avoid"]))
        for r in fixed["refinements"]
    }
    assert got_refs == want_refs, (
        "re-probe should drop exactly the tampered token and keep the "
        "genuinely learned evidence"
    )

    # executing tampered vs fixed runs a different plan: the tampered
    # model's top action is the paging xpath, the fixed model's is not
    ck2, ck3 = tmp_path / "ck2", tmp_path / "ck3"
    for path, ckx in ((tampered, ck2), (fixed_path, ck3)):
        assert cli.main([
            "execute-model", "--model", str(path),
            "--seeds", str(seeds_file), "--checkpoint", str(ckx),
            "--synth-pages", "300", "--synth-hosts", "10",
            "--epochs", "3", "--epoch-ms", "8000",
            "--top-actions", "1", "--harvest-budget", "50",
        ]) == 0
    outs = capsys.readouterr().out.strip().splitlines()
    runs = [json.loads(l) for l in outs if l.startswith("{")]
    assert runs[0]["actions"] == [paging_xp]
    assert runs[1]["actions"] != [paging_xp]


def test_refine_only_parity(spark, tmp_path):
    """Learned :only refinement (dom.clj:603-615 restricted-to-only,
    applied BEFORE :avoid in the reference's refined evaluation): an
    xpath with a non-empty only-set keeps ONLY candidates whose href
    path carries one of its tokens. Engine and sequential oracle must
    agree exactly; the only-set must be a genuine RESTRICTION (it
    changes the crawl vs unrefined, but keeps more than dropping the
    xpath outright would); and only+avoid composed must stay exact."""
    from crawler_spark.engine import CrawlEngine, EngineConfig
    from crawler_spark.oracle import crawl_oracle
    from crawler_spark.schema import ROBOTS_SCHEMA
    from crawler_spark.synth import (
        XPATHS, SynthConfig, corpus_df, robots_rows, seed_urls,
    )

    cfg = SynthConfig(n_pages=400, n_hosts=8, with_images=False)
    corpus = corpus_df(spark, cfg).persist()
    corpus.count()
    robots = spark.createDataFrame(robots_rows(cfg), ROBOTS_SCHEMA)
    seeds = seed_urls(cfg, 4)
    actions, paging = tuple(XPATHS[:3]), tuple(XPATHS[3:5])
    only = ((XPATHS[0], ("3", "5")),)
    base = dict(max_epochs=4, epoch_ms=8000, leaf_limit=60,
                model_xpaths=actions, paging_xpaths=paging)
    obase = dict(max_epochs=4, epoch_ms=8000, leaf_limit=60,
                 model_xpaths=set(actions), paging_xpaths=set(paging))
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(checkpoint_dir=str(tmp_path / "ck_only"),
                     refine_only=only, **base),
    )
    eng.run(seeds)
    oracle = crawl_oracle(
        cfg, seeds, robots_rows(cfg),
        refine_only={xp: set(toks) for xp, toks in only}, **obase,
    )
    got = [(r.seq, r.url, r.epoch) for r in eng.crawl_order.collect()]
    want = [(s, u, e) for (s, u, e, _h) in oracle.crawl_order]
    assert len(got) > 10, "only-restricted harvest should still expand"
    assert got == want
    assert {r.url for r in eng.url_seen.collect()} == oracle.url_seen

    # non-vacuous restriction: changes the crawl vs unrefined...
    unrefined = crawl_oracle(cfg, seeds, robots_rows(cfg), **obase)
    assert oracle.url_seen != unrefined.url_seen, "only set never fired"
    # ...but keeps MORE than deleting the xpath from the model would
    # (a blanket drop would make :only indistinguishable from :avoid-all)
    without = crawl_oracle(
        cfg, seeds, robots_rows(cfg),
        **{**obase, "model_xpaths": set(actions) - {XPATHS[0]}},
    )
    assert oracle.url_seen != without.url_seen, (
        "only set dropped every link of its xpath — not a restriction"
    )

    # only + avoid composed (reference order: only first, then avoid)
    avoid = ((XPATHS[1], ("2",)),)
    eng2 = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(checkpoint_dir=str(tmp_path / "ck_both"),
                     refine_only=only, refine_avoid=avoid, **base),
    )
    eng2.run(seeds)
    oracle2 = crawl_oracle(
        cfg, seeds, robots_rows(cfg),
        refine_only={xp: set(toks) for xp, toks in only},
        refine_avoid={xp: set(toks) for xp, toks in avoid}, **obase,
    )
    got2 = [(r.seq, r.url, r.epoch) for r in eng2.crawl_order.collect()]
    want2 = [(s, u, e) for (s, u, e, _h) in oracle2.crawl_order]
    assert got2 == want2
    assert {r.url for r in eng2.url_seen.collect()} == oracle2.url_seen
    assert oracle2.url_seen != oracle.url_seen, "avoid never fired on top"
    corpus.unpersist()


def test_depth_indexed_action_sequence_parity(spark, tmp_path):
    """Depth-indexed plans (reference xpath-to-pick, crawl.clj:200-202):
    a page at plan depth d follows ONLY model_action_seq[d]; pages past
    the last step expand nothing; paging hops keep the parent depth.
    Engine must match the oracle exactly, and the semantics must DIVERGE
    from the flat set of the same xpaths (otherwise this mode is
    indistinguishable from model_xpaths)."""
    from crawler_spark.engine import CrawlEngine, EngineConfig
    from crawler_spark.oracle import crawl_oracle
    from crawler_spark.schema import ROBOTS_SCHEMA
    from crawler_spark.synth import (
        XPATHS, SynthConfig, corpus_df, robots_rows, seed_urls,
    )

    cfg = SynthConfig(n_pages=400, n_hosts=8, with_images=False)
    corpus = corpus_df(spark, cfg).persist()
    corpus.count()
    robots = spark.createDataFrame(robots_rows(cfg), ROBOTS_SCHEMA)
    seeds = seed_urls(cfg, 4)
    seq = (XPATHS[0], XPATHS[2], XPATHS[1])
    paging = tuple(XPATHS[3:5])
    eng = CrawlEngine(
        spark, corpus, robots,
        EngineConfig(max_epochs=5, epoch_ms=8000,
                     checkpoint_dir=str(tmp_path / "ck_depth"),
                     model_action_seq=seq, paging_xpaths=paging),
    )
    eng.run(seeds)
    oracle = crawl_oracle(
        cfg, seeds, robots_rows(cfg), max_epochs=5, epoch_ms=8000,
        model_action_seq=list(seq), paging_xpaths=set(paging),
    )
    got = [(r.seq, r.url, r.epoch) for r in eng.crawl_order.collect()]
    want = [(s, u, e) for (s, u, e, _h) in oracle.crawl_order]
    assert len(got) > 8, "depth-indexed harvest should expand"
    assert got == want
    assert {r.url for r in eng.url_seen.collect()} == oracle.url_seen
    # flat-set vs depth-indexed must diverge on this web
    flat = crawl_oracle(
        cfg, seeds, robots_rows(cfg), max_epochs=5, epoch_ms=8000,
        model_xpaths=set(seq), paging_xpaths=set(paging),
    )
    assert oracle.url_seen != flat.url_seen, (
        "depth-indexed and flat semantics coincide — test web too simple"
    )


def test_cli_execute_model_depth_indexed_and_no_refine(spark, tmp_path, capsys):
    """The round-3 CLI surface end-to-end: execute-model --depth-indexed
    treats the top actions as an ordered depth-indexed plan, and
    --no-refine ignores any learned refinements; both run a real harvest
    and report their mode in the output JSON."""
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text("http://host0.test/p/0/img-42-00000000\n")
    ck = tmp_path / "ck"
    assert cli.main([
        "crawl", "--seeds", str(seeds_file), "--checkpoint", str(ck),
        "--synth-pages", "300", "--synth-hosts", "10",
        "--epochs", "3", "--epoch-ms", "8000",
    ]) == 0
    capsys.readouterr()
    model_path = tmp_path / "model.json"
    assert cli.main([
        "learn-model", "--checkpoint", str(ck),
        "--synth-pages", "300", "--synth-hosts", "10",
        "--out", str(model_path),
    ]) == 0
    capsys.readouterr()
    assert cli.main([
        "execute-model", "--model", str(model_path),
        "--seeds", str(seeds_file), "--checkpoint", str(tmp_path / "ck2"),
        "--synth-pages", "300", "--synth-hosts", "10",
        "--epochs", "3", "--epoch-ms", "8000",
        "--top-actions", "2", "--harvest-budget", "20",
        "--depth-indexed", "--no-refine",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["depth_indexed"] is True
    assert out["refine_avoid"] == []
    assert len(out["actions"]) == 2
    assert out["manifest"]["dequeue_seq"] > 0


def test_cli_paging_model_e2e(spark, tmp_path, capsys):
    """Per-source paging through the whole CLI pipeline: learn-model
    emits a well-formed paging_model; fix-model strips a MIXED
    suffix-shadowed plan (corpus.clj:409-438 intended rule — prefix
    match + refinement equality) while keeping a refinement-mismatched
    twin, carries paging_model through un-probed, and the fixed model
    executes with the per-source entries in effect."""
    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text("http://host0.test/p/0/img-42-00000000\n")
    ck = tmp_path / "ck"
    assert cli.main([
        "crawl", "--seeds", str(seeds_file), "--checkpoint", str(ck),
        "--synth-pages", "300", "--synth-hosts", "10",
        "--epochs", "3", "--epoch-ms", "8000",
    ]) == 0
    capsys.readouterr()
    model_path = tmp_path / "model.json"
    assert cli.main([
        "learn-model", "--checkpoint", str(ck),
        "--synth-pages", "300", "--synth-hosts", "10",
        "--out", str(model_path),
    ]) == 0
    capsys.readouterr()
    model = json.loads(model_path.read_text())
    assert "paging_model" in model
    for e in model["paging_model"]:
        assert set(e) >= {"action_seq", "paging_xpath", "only", "avoid"}

    # tamper: a per-source paging entry + three plans — the mixed plan
    # whose chronological prefix re-walks (seq A → paging B) with a
    # MATCHING (empty) refinement is shadowed; the same-prefix plan
    # whose final action carries a different refinement survives; the
    # unrelated plan survives
    model["paging_model"] = [
        {"action_seq": ["A"], "paging_xpath": "B", "cosine": 1.0,
         "only": [], "avoid": []},
    ]
    model["action_seqs"] = [
        {"actions": ["A", "B", "C"], "yield": 3},   # shadowed (mixed!)
        {"actions": ["A", "B"], "yield": 2},        # ref mismatch → kept
        {"actions": ["C", "A"], "yield": 1},        # no prefix → kept
    ]
    model["refinements"] = [{"xpath": "B", "only": [], "avoid": ["z"]}]
    model_path.write_text(json.dumps(model))
    fixed_path = tmp_path / "fixed.json"
    assert cli.main([
        "fix-model", "--model", str(model_path), "--checkpoint", str(ck),
        "--synth-pages", "300", "--synth-hosts", "10",
        "--out", str(fixed_path),
    ]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    fixed = json.loads(fixed_path.read_text())
    kept = [tuple(s["actions"]) for s in fixed["action_seqs"]]
    assert ("A", "B", "C") not in kept
    assert ("A", "B") in kept and ("C", "A") in kept
    assert rep["seqs_stripped"] == 1
    # pagination refinements are trusted always — carried, not re-probed
    assert fixed["paging_model"] == model["paging_model"]

    # the fixed model executes with per-source paging in effect
    assert cli.main([
        "execute-model", "--model", str(fixed_path),
        "--seeds", str(seeds_file), "--checkpoint", str(tmp_path / "ck2"),
        "--synth-pages", "300", "--synth-hosts", "10",
        "--epochs", "3", "--epoch-ms", "8000",
        "--top-actions", "2", "--harvest-budget", "20",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["manifest"]["dequeue_seq"] > 0
    # per-source mode replaces the global paging-xpath set
    assert out["paging_xpaths"] == []
