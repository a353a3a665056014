"""spark-submit entry point.

North-rule deployment shape: ``spark-submit --py-files crawler_spark.zip
crawler_spark/cli.py crawl --seeds seeds.txt --corpus /path/corpus
--checkpoint /path/ck --epochs 10``. In the sandbox the same module runs
under plain ``python`` with a local master. Mirrors the reference CLI
(``main.clj:307-352`` crawler-options: --start/--num-leaves/--budget →
seeds/--leaf-limit/--max-pages).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="crawler-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the epoch-batched frontier crawl")
    c.add_argument("--seeds", required=True, help="text file, one URL per line")
    c.add_argument("--corpus", help="parquet path of the fetchable corpus; "
                                    "omit to use the deterministic synthetic web")
    c.add_argument("--synth-pages", type=int, default=2000)
    c.add_argument("--synth-hosts", type=int, default=20)
    c.add_argument("--robots", help="parquet path of robots rules (host, "
                                    "disallow_prefixes, crawl_delay_ms)")
    c.add_argument("--checkpoint", required=True)
    c.add_argument("--resume", action="store_true",
                   help="resume from the latest snapshot in --checkpoint")
    c.add_argument("--epochs", type=int, default=10)
    c.add_argument("--epoch-ms", type=int, default=30_000)
    c.add_argument("--max-pages", type=int, default=None,
                   help="crawl budget (reference --budget, default 1000)")
    c.add_argument("--leaf-limit", type=int, default=None,
                   help="leaf budget (reference --num-leaves, default 300)")
    c.add_argument("--no-bloom", action="store_true")
    c.add_argument("--master", default=None)

    m = sub.add_parser("learn-model", help="derive the leaf-path model from a "
                                           "finished crawl checkpoint")
    m.add_argument("--checkpoint", required=True)
    m.add_argument("--corpus", help="parquet corpus (omit → synthetic)")
    m.add_argument("--synth-pages", type=int, default=2000)
    m.add_argument("--synth-hosts", type=int, default=20)
    m.add_argument("--out", required=True, help="output path for the model JSON")
    m.add_argument("--master", default=None)

    e = sub.add_parser(
        "execute-model",
        help="model-driven harvest (reference execute-model, "
             "main.clj:198-239): follow only the learned model's xpaths, "
             "chase its pagination xpaths, stop at the leaf budget",
    )
    e.add_argument("--model", required=True, help="model JSON from learn-model")
    e.add_argument("--seeds", required=True, help="text file, one URL per line")
    e.add_argument("--corpus", help="parquet corpus (omit → synthetic)")
    e.add_argument("--synth-pages", type=int, default=2000)
    e.add_argument("--synth-hosts", type=int, default=20)
    e.add_argument("--robots", help="parquet robots rules")
    e.add_argument("--checkpoint", required=True)
    e.add_argument("--epochs", type=int, default=10)
    e.add_argument("--epoch-ms", type=int, default=30_000)
    e.add_argument("--top-actions", type=int, default=3,
                   help="how many top-ranked model xpaths to follow")
    e.add_argument("--harvest-budget", type=int, default=300,
                   help="stop once this many leaf pages harvested "
                        "(reference --num-leaves)")
    e.add_argument("--no-refine", action="store_true",
                   help="ignore the model's learned :avoid refinements")
    e.add_argument("--depth-indexed", action="store_true",
                   help="treat the top-ranked xpaths as an ORDERED action "
                        "sequence indexed by plan depth (reference "
                        "xpath-to-pick) instead of a flat set")
    e.add_argument("--master", default=None)
    return p


def _session(master):
    """(spark, owned): owned=False when an active session already exists
    (e.g. embedded in a larger app/test harness) — then getOrCreate
    returns it and the CLI must NOT stop it on exit."""
    from pyspark.sql import SparkSession

    from crawler_spark.session import get_spark

    existing = SparkSession.getActiveSession()
    return get_spark("crawler-spark-cli", master=master), existing is None


def cmd_crawl(args) -> int:
    from crawler_spark.engine import CrawlEngine, EngineConfig
    from crawler_spark.schema import ROBOTS_SCHEMA
    from crawler_spark.sources import read_seed_list
    from crawler_spark.synth import SynthConfig, corpus_df, robots_rows

    spark, owned = _session(args.master)
    if args.corpus:
        corpus = spark.read.parquet(args.corpus)
    else:
        corpus = corpus_df(
            spark, SynthConfig(n_pages=args.synth_pages, n_hosts=args.synth_hosts,
                               with_images=False)
        )
    if args.robots:
        robots = spark.read.parquet(args.robots)
    else:
        robots = spark.createDataFrame(
            robots_rows(SynthConfig(n_pages=args.synth_pages, n_hosts=args.synth_hosts)),
            ROBOTS_SCHEMA,
        )
    cfg = EngineConfig(
        max_epochs=args.epochs,
        epoch_ms=args.epoch_ms,
        max_pages=args.max_pages,
        leaf_limit=args.leaf_limit,
        use_bloom=not args.no_bloom,
        checkpoint_dir=args.checkpoint,
    )
    eng = CrawlEngine(spark, corpus, robots, cfg)
    if args.resume:
        eng.resume()
        manifest = eng.run()
    else:
        seeds = [r.url for r in read_seed_list(spark, args.seeds).orderBy("ord").collect()]
        manifest = eng.run(seeds)
    summary = {
        "manifest": manifest,
        "metrics": [r.asDict() for r in eng.metrics.collect()],
    }
    print(json.dumps(summary, default=str))
    if owned:
        spark.stop()
    return 0


def cmd_learn_model(args) -> int:
    """Model = frequencies of leaf src-xpaths over the crawl (the learned
    model of the reference is exactly `frequencies` of leaf paths,
    crawl.clj:108) + pagination xpaths observed in the paging queue."""
    import os

    from pyspark.sql import functions as F

    from crawler_spark.synth import SynthConfig, corpus_df

    from crawler_spark.engine import read_state_tables

    spark, owned = _session(args.master)
    tables = read_state_tables(
        spark, args.checkpoint, ["crawl_order", "frontier"]
    )
    order, frontier = tables["crawl_order"], tables["frontier"]
    if args.corpus:
        corpus = spark.read.parquet(args.corpus)
    else:
        corpus = corpus_df(
            spark, SynthConfig(n_pages=args.synth_pages, n_hosts=args.synth_hosts,
                               with_images=False)
        )
    fetched = corpus.join(order.select("url"), "url", "left_semi")
    leaf_links = (
        fetched.filter(F.col("is_leaf"))
        .select(F.explode("out_links").alias("l"))
        .groupBy(F.col("l.xpath").alias("xpath"))
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("xpath"))
    )
    paging_xpaths = (
        frontier.filter(F.col("queue") == "paging")
        .groupBy("src_xpath")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"))
    )
    # refinement learning (dom.clj:942-1061, model.clj:30-175): label
    # every crawled link muscle (target page is a leaf) vs fat (target
    # fetched, not a leaf); targets never fetched are unknown and
    # excluded. refine_xpaths then finds per-xpath URL path tokens that
    # appear ONLY in fat links (:avoid) / only in muscle links (:only).
    from crawler_spark.operators.xpath_model import refine_xpaths

    from crawler_spark.canon import canonicalize_expr

    tgt = corpus.select(
        F.col("url").alias("href"), F.col("is_leaf").alias("good")
    ).join(order.select(F.col("url").alias("href")), "href", "left_semi")
    # canonicalize each href against its source page before joining the
    # fetched-target table: relative / fragment-bearing hrefs would never
    # equal a canonical corpus url, silently excluding those links from
    # muscle/fat labeling — and execution applies avoid tokens to
    # CANONICAL urls, so learning must tokenize the same keys
    labeled = (
        fetched.select("url", F.explode("out_links").alias("l"))
        .select(
            F.col("l.xpath").alias("xpath"),
            canonicalize_expr(F.col("l.href"), F.col("url")).alias("href"),
        )
        .filter(F.col("href").isNotNull())
        .join(tgt, "href")
    )
    refinements = [
        r.asDict() for r in refine_xpaths(labeled).orderBy("xpath").collect()
    ]
    model = {
        "leaf_xpath_freqs": [r.asDict() for r in leaf_links.collect()],
        "pagination_xpaths": [r.asDict() for r in paging_xpaths.collect()],
        "refinements": refinements,
    }
    with open(args.out, "w") as f:
        json.dump(model, f, indent=2)
    print(json.dumps({"written": args.out,
                      "n_leaf_xpaths": len(model["leaf_xpath_freqs"]),
                      "n_paging_xpaths": len(model["pagination_xpaths"])}))
    if owned:
        spark.stop()
    return 0


def cmd_execute_model(args) -> int:
    """E3: the dual-queue plan executor — consume a learned model, follow
    only its ranked xpath actions (W4 plan ordering = freq desc, xpath
    asc tie-break), chase its pagination xpaths through the paging queue,
    decrement the leaf budget (crawl.clj:246-530, execute.clj:10-58)."""
    from pyspark.sql import functions as F

    from crawler_spark.engine import CrawlEngine, EngineConfig
    from crawler_spark.schema import ROBOTS_SCHEMA
    from crawler_spark.sources import read_seed_list
    from crawler_spark.synth import SynthConfig, corpus_df, robots_rows

    spark, owned = _session(args.master)
    with open(args.model) as f:
        model = json.load(f)
    ranked = sorted(
        model["leaf_xpath_freqs"], key=lambda r: (-r["freq"], r["xpath"])
    )
    actions = tuple(r["xpath"] for r in ranked[: args.top_actions])
    paging = tuple(
        r["src_xpath"] for r in model.get("pagination_xpaths", [])
        if r.get("src_xpath")
    )
    # learned refinements ride the model JSON; only non-empty token
    # lists matter at execution time. :only restricts (keep links whose
    # href path carries an only-token, dom.clj:603-615) and is applied
    # before :avoid drops (dom.clj:617-631), as in the reference's
    # refined evaluation.
    refine_avoid, refine_only = (), ()
    if not args.no_refine:
        refine_avoid = tuple(
            (r["xpath"], tuple(r["avoid"]))
            for r in model.get("refinements", [])
            if r.get("avoid")
        )
        refine_only = tuple(
            (r["xpath"], tuple(r["only"]))
            for r in model.get("refinements", [])
            if r.get("only")
        )
    if args.corpus:
        corpus = spark.read.parquet(args.corpus)
    else:
        corpus = corpus_df(
            spark, SynthConfig(n_pages=args.synth_pages, n_hosts=args.synth_hosts,
                               with_images=False)
        )
    if args.robots:
        robots = spark.read.parquet(args.robots)
    else:
        robots = spark.createDataFrame(
            robots_rows(SynthConfig(n_pages=args.synth_pages, n_hosts=args.synth_hosts)),
            ROBOTS_SCHEMA,
        )
    cfg = EngineConfig(
        max_epochs=args.epochs,
        epoch_ms=args.epoch_ms,
        leaf_limit=args.harvest_budget,
        checkpoint_dir=args.checkpoint,
        model_xpaths=None if args.depth_indexed else actions,
        model_action_seq=actions if args.depth_indexed else None,
        paging_xpaths=paging,
        refine_avoid=refine_avoid,
        refine_only=refine_only,
    )
    eng = CrawlEngine(spark, corpus, robots, cfg)
    seeds = [r.url for r in read_seed_list(spark, args.seeds).orderBy("ord").collect()]
    manifest = eng.run(seeds)
    harvested = (
        corpus.join(F.broadcast(eng.crawl_order.select("url")), "url", "left_semi")
        .filter(F.col("is_leaf"))
        .count()
    )
    print(json.dumps({
        "manifest": manifest,
        "actions": list(actions),
        "depth_indexed": bool(args.depth_indexed),
        "paging_xpaths": list(paging),
        "refine_avoid": [[xp, list(av)] for xp, av in refine_avoid],
        "refine_only": [[xp, list(on)] for xp, on in refine_only],
        "harvested_leaves": harvested,
        "metrics": [r.asDict() for r in eng.metrics.collect()],
    }, default=str))
    if owned:
        spark.stop()
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "crawl":
        return cmd_crawl(args)
    if args.cmd == "learn-model":
        return cmd_learn_model(args)
    if args.cmd == "execute-model":
        return cmd_execute_model(args)
    return 2


if __name__ == "__main__":
    sys.exit(main())
