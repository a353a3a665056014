"""E3 multi-action-sequence budgeted model execution — the reference's
``execute-model-budget-crawler`` driver loop.

The reference plans the learned model's MANY action sequences by
(plan length asc, estimated yield desc) (``execute.clj:10-17``
``plan-model``; ``main.clj:247-263``) and folds them through
``crawl-model`` under ONE shared page budget (``main.clj:264-287``,
``execute.clj:59-86``): each sequence crawls from the same start url
with a fresh blacklist, its budget is what the previous sequences left
(``(- budget budget-spent)``), ``budget-spent`` grows by ``|visited|``
of the sequence just run, and a sequence reached after the budget is
exhausted is skipped outright (``(<= (- budget budget-spent) 0)``).

Spark shape: each action sequence is one depth-indexed ``CrawlEngine``
run (``EngineConfig.model_action_seq``) with ``max_pages`` = the
remaining budget. The engine's budget stop is epoch-granular — it stops
BEFORE an epoch once ``dequeue_seq >= max_pages`` (the batch analog of
the reference's per-page ``budget-stop?``, ``execute.clj:50-58``) — and
the sequential oracle applies the identical rule, so multi-sequence
parity stays exact. Nothing here adds a new distributed operator: the
loop is driver-side control flow over full engine runs, exactly like
the reference's ``reduce`` over ``planned-model``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import CrawlEngine, EngineConfig


def plan_model(action_seqs) -> list:
    """Rank action sequences the way the reference's planner does
    (``execute.clj:10-17``): by (sequence length asc, yield desc) —
    shorter plans first, richer plans first within a length. Input:
    iterable of ``(actions_tuple, yield_number)`` pairs (the learned
    model's ``:actions`` frequency map, ``crawl.clj:108``). The actions
    tuple itself is the deterministic tie-break (Clojure's sort is
    stable on insertion order; a column sort needs an explicit key).
    Returns the bare action tuples in execution order."""
    pairs = [(tuple(a), y) for a, y in action_seqs]
    pairs.sort(key=lambda p: (len(p[0]), -p[1], p[0]))
    return [a for a, _y in pairs]


@dataclass
class SeqRun:
    """Ledger entry for one planned sequence: the budget it was launched
    with (``max_pages``), what it actually visited, and whether the
    shared budget was already exhausted when its turn came."""

    actions: tuple
    max_pages: int
    visited: int
    skipped: bool
    crawl_order: DataFrame | None = None
    url_seen: DataFrame | None = None


@dataclass
class MultiseqResult:
    budget: int
    budget_spent: int = 0
    runs: list = field(default_factory=list)

    def crawl_order(self) -> DataFrame | None:
        """All sequences' crawl orders, tagged with the plan index —
        (plan_idx, seq, url, epoch, host). seq numbering restarts per
        sequence (each runs with a fresh frontier, like the reference's
        fresh blacklist per action-seq)."""
        parts = [
            r.crawl_order.withColumn("plan_idx", F.lit(i).cast("long"))
            for i, r in enumerate(self.runs)
            if not r.skipped and r.crawl_order is not None
        ]
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.select("plan_idx", "seq", "url", "epoch", "host")


def execute_model_budget(
    spark: SparkSession,
    corpus: DataFrame,
    robots: DataFrame,
    seeds: list,
    planned: list,
    paging_xpaths: tuple,
    budget: int,
    checkpoint_root: str,
    max_epochs: int = 10,
    epoch_ms: int = 30_000,
    **engine_kwargs,
) -> MultiseqResult:
    """Run ``planned`` (ranked action sequences, see :func:`plan_model`)
    through successive depth-indexed engine runs under one shared page
    budget (``main.clj:264-287``). Each sequence gets its own checkpoint
    dir under ``checkpoint_root`` (``seq-NNN``) so every run stays
    individually resumable/inspectable; a skipped sequence creates no
    checkpoint at all."""
    res = MultiseqResult(budget=budget)
    for i, actions in enumerate(planned):
        remaining = budget - res.budget_spent
        if remaining <= 0:
            # reference: `(if (<= (- budget budget-spent) 0)` — the
            # sequence is never launched, not launched-and-stopped
            res.runs.append(
                SeqRun(actions=tuple(actions), max_pages=0, visited=0,
                       skipped=True)
            )
            continue
        ck = os.path.join(checkpoint_root, f"seq-{i:03d}")
        eng = CrawlEngine(
            spark, corpus, robots,
            EngineConfig(
                max_epochs=max_epochs,
                epoch_ms=epoch_ms,
                max_pages=remaining,
                checkpoint_dir=ck,
                model_action_seq=tuple(actions),
                paging_xpaths=tuple(paging_xpaths),
                **engine_kwargs,
            ),
        )
        manifest = eng.run(list(seeds))
        visited = int(manifest["dequeue_seq"])
        res.budget_spent += visited
        res.runs.append(
            SeqRun(
                actions=tuple(actions), max_pages=remaining,
                visited=visited, skipped=False,
                crawl_order=eng.crawl_order, url_seen=eng.url_seen,
            )
        )
    return res
