"""Host-keyed politeness scheduling (SURVEY.md §2.12).

The reference's politeness is a literal ``Thread/sleep 1000`` before every
fetch (``crawl.clj:83``) — 1 URL/sec total, sequential. The batch analog:
per epoch of nominal length ``epoch_ms``, host h may be scheduled at most
``quota(h) = max(1, epoch_ms // crawl_delay_ms(h))`` times. Selection
within a host is by ascending ``insertion_seq`` (FIFO/BFS, matching the
reference's queue order, ``crawl.clj:90,134``), expressed as a
``row_number`` window partitioned by host — Spark sorts each host's
pending rows in parallel across the cluster.

robots.txt handling (disallow prefixes + crawl-delay) is an *addition*
relative to the reference, which declares clj-robots but never imports it
(``project.clj:10``); north_rule requires it for real. Rules are a small
per-host table → broadcast join.

Skew: a hot host's window sort is bounded by that host's pending rows.
The frontier table itself is stored salted (``host_salt = pmod(url_hash,
n_salts)``) so scans/writes spread, and AQE skew-join handling is enabled
in the session defaults; the *quota* is enforced on the real host key
after the window, so salting never violates politeness (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _robots_side(robots: DataFrame, cols: list, bcast: bool) -> DataFrame:
    """Robots build side for the per-host joins. The robots table is
    per-HOST — bounded by live-host cardinality, not URL count — so it
    broadcasts by default; at the 10^10-URL design point (10^7-10^8
    hosts, disallow-prefix arrays) a forced broadcast would hit the same
    ceiling the epoch-batch joins guard against, so callers that know
    the table is big (engine: one cached count vs
    ``EngineConfig.broadcast_max_rows``) pass ``bcast=False`` and the
    join falls back to hashing the robots side under the frontier's
    existing host partitioning — strategy only, semantics untouched
    (tests/test_broadcast_guard.py)."""
    side = robots.select(*cols)
    return F.broadcast(side) if bcast else side.hint("shuffle_hash")


def with_disallowed_flag(
    frontier: DataFrame, robots: DataFrame, bcast: bool = True
) -> DataFrame:
    """Pending frontier rows + ``__disallowed`` flag from the (size-
    guarded, see ``_robots_side``) robots table's disallow prefixes
    (one pass; callers split/count with a single aggregate instead of
    two filter jobs)."""
    path = F.regexp_replace(F.col("url"), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    joined = frontier.withColumn("__path", path).join(
        _robots_side(robots, ["host", "disallow_prefixes"], bcast), "host", "left"
    )
    is_disallowed = F.exists(
        F.coalesce(F.col("disallow_prefixes"), F.array()),
        lambda p: F.col("__path").startswith(p),
    )
    return joined.withColumn("__disallowed", is_disallowed).drop(
        "__path", "disallow_prefixes"
    )


def robots_filter(
    frontier: DataFrame, robots: DataFrame, bcast: bool = True
) -> tuple:
    """Split pending frontier rows into (allowed, disallowed)."""
    flagged = with_disallowed_flag(frontier, robots, bcast=bcast)
    return (
        flagged.filter(~F.col("__disallowed")).drop("__disallowed"),
        flagged.filter(F.col("__disallowed")).drop("__disallowed"),
    )


def dequeue(
    allowed: DataFrame,
    robots: DataFrame,
    epoch_ms: int,
    n_salts: int = 16,
    approx_rows: int | None = None,
    salted_threshold: int = 2_000_000,
    bcast: bool = True,
) -> tuple:
    """(selected, rest): per-host quota window over the allowed pending
    rows. ``selected`` keeps frontier columns; global dequeue order is
    ascending insertion_seq (assigned upstream, unique).

    Dual-queue semantics (reference crawl-model automaton,
    ``crawl.clj:262-263, 433-456``): content rows always outrank paging
    rows — a host spends quota on its ``paging`` queue only in epochs
    where it has NO pending content rows (the batch analog of "promote a
    paging entry when the content queue drains").

    Mega-host guard: a naive per-host ``row_number`` window sorts the
    host's ENTIRE backlog in one task — a host with 10⁹ pending rows at
    10^10-frontier scale is a single-task sort. Selection is therefore
    two-phase salted top-k, which is EXACT (the global top-q rows of a
    host are each within the top-q of their salt partition — pigeonhole):
    phase 1 ranks within (host, salt) and keeps ≤ quota rows per salt,
    bounding any task's sort to backlog/n_salts and the phase-2 input to
    n_salts·quota rows per host; phase 2 re-ranks that small survivor set
    exactly. Rows pruned in phase 1 are provably unselected → rest.

    Adaptive: when the caller knows the pending row count
    (``approx_rows``) and it is under ``salted_threshold``, the direct
    single-window path runs instead — identical selection (the salted
    path is exact), but one exchange+sort rather than two. The fixed
    cost of the extra phase only pays for itself when a single host's
    backlog can exceed one task's sort budget."""
    content = allowed.filter(F.col("queue") == "content")
    paging = allowed.filter(F.col("queue") == "paging")
    hosts_with_content = content.select("host").distinct()
    paging_blocked = paging.join(hosts_with_content, "host", "left_semi")
    paging_eligible = paging.join(hosts_with_content, "host", "left_anti")
    pool = content.unionByName(paging_eligible)

    quota = F.greatest(
        F.lit(1),
        F.floor(F.lit(epoch_ms) / F.coalesce(F.col("crawl_delay_ms"), F.lit(1000))),
    )
    # quota selection order: content FIFO by insertion_seq; paging rows
    # deepest-src_xpath first (W3 "promote the deepest paging entry",
    # crawl.clj:437-443), ties by insertion_seq. A host never mixes the
    # two queues in one epoch, so one window covers both cases.
    depth_key = F.when(
        F.col("queue") == "paging",
        -F.length(F.coalesce(F.col("src_xpath"), F.lit(""))),
    ).otherwise(F.lit(0))
    helpers = ["__rn1", "__rn", "__quota", "__salt", "crawl_delay_ms"]
    pooled = pool.join(
        _robots_side(robots, ["host", "crawl_delay_ms"], bcast), "host", "left"
    ).withColumn("__quota", quota)
    w2 = Window.partitionBy("host").orderBy(
        depth_key.asc(), F.col("insertion_seq").asc()
    )
    if approx_rows is not None and approx_rows < salted_threshold:
        # small batch: one window, same result
        ranked = pooled.withColumn("__rn", F.row_number().over(w2))
        selected = ranked.filter(F.col("__rn") <= F.col("__quota"))
        rest = ranked.filter(F.col("__rn") > F.col("__quota"))
        return (
            selected.drop(*helpers),
            rest.drop(*helpers).unionByName(paging_blocked),
        )
    # phase 1: prune within (host, salt) — insertion_seq is unique, so the
    # salt spreads any one host's backlog across n_salts tasks
    w1 = Window.partitionBy("host", "__salt").orderBy(
        depth_key.asc(), F.col("insertion_seq").asc()
    )
    phase1 = pooled.withColumn(
        "__salt", F.pmod(F.col("insertion_seq"), F.lit(n_salts))
    ).withColumn("__rn1", F.row_number().over(w1))
    survivors = phase1.filter(F.col("__rn1") <= F.col("__quota"))
    pruned = phase1.filter(F.col("__rn1") > F.col("__quota"))
    # phase 2: exact rank over ≤ n_salts·quota survivors per host
    ranked = survivors.withColumn("__rn", F.row_number().over(w2))
    selected = ranked.filter(F.col("__rn") <= F.col("__quota")).drop(*helpers)
    rest = (
        ranked.filter(F.col("__rn") > F.col("__quota"))
        .drop(*helpers)
        .unionByName(pruned.drop(*helpers))
        .unionByName(paging_blocked)
    )
    return selected, rest
