"""Sequential single-node oracle — executable reference semantics.

A tiny, obviously-correct Python restatement of the reference crawl loop
(``crawl.clj:46-198``: FIFO BFS, visited∪queue blacklist, same-host +
nofollow/javascript link predicate, politeness), run over the same
deterministic synthetic web as the Spark engine. The engine must match
its **crawl order exactly** and its **final URL-seen set exactly**
(BASELINE.json north_rule). SURVEY.md §5 explains why this harness exists:
the reference ships no reusable test oracle of its own.

Semantics contract (both sides implement THIS, deterministically):

* Epoch e: for each host, dequeue the ``quota(host) = max(1,
  epoch_ms // crawl_delay_ms)`` pending frontier rows with the smallest
  ``insertion_seq`` (politeness window analog of the reference's
  1-request-per-sleep loop, ``crawl.clj:83``). Robots-disallowed rows are
  dropped (never fetched, never expanded). Global dequeue order within an
  epoch = ascending ``insertion_seq``.
* Fetch = corpus lookup. Per fetched page, iterate out_links in stored
  order: HTML-unescape → drop javascript:/nofollow → resolve relative →
  strip fragment (``dom.clj:315-369``) → same-host filter
  (``dom.clj:353``).
* URL-seen = everything *ever enqueued* (reference blacklist is
  visited ∪ queue ∪ current candidates, ``crawl.clj:125-129``). A
  candidate already seen — or seen earlier in the same epoch by a page
  with a smaller (dequeue_seq, link_position) — is dropped.
* Survivors get ``insertion_seq`` values continuing the global counter,
  in (parent dequeue order, link position) order, and enter URL-seen
  immediately. Digit-anchored links (``^[0-9]+$`` anchor text,
  corpus.clj:127-131) enter the ``paging`` queue; all others ``content``.
* Dual queue (crawl.clj:262-263, 433-456): a host dequeues ``paging``
  rows only in epochs where it has no pending ``content`` rows.
* Leaf budget (--num-leaves, main.clj:25-28): stop before an epoch once
  cumulative fetched pages with ``is_leaf`` ≥ leaf_limit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .canon import canonicalize, host_of
from .hashing import url_hash
from .synth import SynthConfig, gen_all


@dataclass
class OracleResult:
    crawl_order: list = field(default_factory=list)  # (seq, url, epoch, host)
    url_seen: set = field(default_factory=set)
    fetched: list = field(default_factory=list)  # corpus rows (dicts) in fetch order
    metrics: list = field(default_factory=list)  # per-epoch dicts
    samples: list = field(default_factory=list)  # E2 sampling evidence dicts
    # action path per crawl_order row (same index): the xpath sequence
    # that reached the page — reference src-path, crawl.clj:200-202
    crawl_paths: list = field(default_factory=list)
    epochs_run: int = 0


def crawl_oracle(
    cfg: SynthConfig,
    seeds: list,
    robots: list,
    max_epochs: int = 10,
    epoch_ms: int = 30_000,
    max_pages: int | None = None,
    leaf_limit: int | None = None,
    track_content_dups: bool = False,
    content_dup_stop: int | None = None,
    model_xpaths: set | None = None,
    paging_xpaths: set = frozenset(),
    paging_model: dict | None = None,
    model_action_seq: list | None = None,
    refine_avoid: dict | None = None,
    refine_only: dict | None = None,
    recrawl_ttl_epochs: int | None = None,
    exemplar_sampling: bool = False,
    exemplar_threshold: float = 0.95,
) -> OracleResult:
    import re

    def norm_caption(s: str) -> str:
        # mirror of operators.dedup.normalize_text
        s = s.lower()
        s = re.sub(r"[^\w\s]", " ", s)
        return re.sub(r"\s+", " ", s).strip()

    corpus = gen_all(cfg)
    records = corpus.to_dict("records")
    by_url = {r["url"]: r for r in records}
    # S3 redirect closure: alias → page; fetching an alias returns the
    # canonical page, inserts its url into seen, and re-fetches of an
    # already-extracted page are cache hits (no re-extraction)
    # duplicate alias claims resolve to the page with the SMALLEST
    # canonical url (deterministic, order-independent — engine rule)
    by_alias: dict = {}
    for r in records:
        for a in r.get("aliases") or []:
            cur = by_alias.get(a)
            if cur is None or r["url"] < cur["url"]:
                by_alias[a] = r
    delay = {r["host"]: r["crawl_delay_ms"] for r in robots}
    disallow = {r["host"]: r["disallow_prefixes"] for r in robots}

    res = OracleResult()
    frontier: list = []  # pending: dict(url, host, insertion_seq, queue)
    next_seq = 0
    for u in seeds:
        cu = canonicalize(u, u)
        if cu is None or cu in res.url_seen:
            continue
        res.url_seen.add(cu)
        frontier.append(
            {"url": cu, "host": host_of(cu), "insertion_seq": next_seq,
             "queue": "content", "depth": 0, "path": ()}
        )
        next_seq += 1

    dequeue_seq = 0
    leaves_total = 0
    neardups_total = 0
    content_seen: set = set()
    extracted: set = set()
    last_scheduled: dict = {}  # url → latest epoch it was dequeued
    for epoch in range(max_epochs):
        if not frontier or (max_pages is not None and dequeue_seq >= max_pages):
            break
        if leaf_limit is not None and leaves_total >= leaf_limit:
            break
        if content_dup_stop is not None and neardups_total >= content_dup_stop:
            break
        if recrawl_ttl_epochs is not None and epoch - recrawl_ttl_epochs >= 0:
            # TTL expiry (engine EngineConfig.recrawl_ttl_epochs): urls
            # last scheduled exactly ttl epochs ago leave URL-seen (and
            # the extracted cache) — re-discovery recrawls them fresh;
            # no re-enqueue
            expire_epoch = epoch - recrawl_ttl_epochs
            for u, e in last_scheduled.items():
                if e == expire_epoch:
                    res.url_seen.discard(u)
                    extracted.discard(u)
        # robots filter first (engine order: robots_filter → dequeue)
        def is_disallowed(entry):
            # mirror politeness.with_disallowed_flag: strip scheme +
            # authority by regex (splitting on the host string crashes
            # on an empty-authority url and mis-splits when the host
            # text also appears in the path)
            h = entry["host"]
            path = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "", entry["url"])
            return any(path.startswith(p) for p in disallow.get(h, []))

        allowed = [e for e in frontier if not is_disallowed(e)]
        disallowed = len(frontier) - len(allowed)
        # dual queue: hosts with pending (allowed) content rows may not
        # spend quota on paging rows this epoch
        hosts_with_content = {e["host"] for e in allowed if e["queue"] == "content"}
        # politeness quota selection: content FIFO; paging deepest
        # src_xpath first (W3, crawl.clj:437-443), ties by insertion_seq.
        # Global dequeue order stays ascending insertion_seq (re-sorted
        # after selection) — depth only decides WHICH rows make quota.
        def sel_key(e):
            depth = -len(e.get("src_xpath") or "") if e["queue"] == "paging" else 0
            return (depth, e["insertion_seq"])

        budget_left: dict = {}
        selected, remaining = [], []
        for entry in sorted(allowed, key=sel_key):
            h = entry["host"]
            if entry["queue"] == "paging" and h in hosts_with_content:
                remaining.append(entry)
                continue
            q = budget_left.setdefault(h, max(1, epoch_ms // delay.get(h, 1000)))
            if q > 0:
                budget_left[h] = q - 1
                selected.append(entry)
            else:
                remaining.append(entry)
        selected.sort(key=lambda e: e["insertion_seq"])
        frontier = remaining
        if not selected:
            res.metrics.append(
                dict(epoch=epoch, urls_scheduled=0, pages_fetched=0, links_extracted=0,
                     links_enqueued=0, dups_dropped=0, disallowed_dropped=disallowed,
                     leaves_fetched=0, neardup_fetched=0)
            )
            res.epochs_run = epoch + 1
            if not frontier:
                break
            continue

        fetched_ct = links_ct = enq_ct = dups_ct = leaves_ct = neardup_ct = 0
        new_entries = []
        for entry in selected:  # already in ascending insertion_seq order
            res.crawl_order.append((dequeue_seq, entry["url"], epoch, entry["host"]))
            res.crawl_paths.append(tuple(entry.get("path", ())))
            last_scheduled[entry["url"]] = epoch
            dequeue_seq += 1
            page = by_url.get(entry["url"]) or by_alias.get(entry["url"])
            if page is None:
                continue
            fetched_ct += 1
            if entry["url"] != page["url"]:
                # redirect followed: closure inserts the canonical url —
                # BEFORE this page's (and any later page's) links resolve
                res.url_seen.add(page["url"])
            if page["url"] in extracted:
                continue  # redirect cache hit: fetched, not re-extracted
            extracted.add(page["url"])
            if page["is_leaf"]:
                leaves_ct += 1
            if track_content_dups:
                ch = norm_caption(page["caption"])
                if ch in content_seen:
                    neardup_ct += 1
                else:
                    content_seen.add(ch)
            res.fetched.append(page)
            for link in page["out_links"]:
                if link["nofollow"]:
                    continue
                cu = canonicalize(link["href"], page["url"])
                if cu is None:
                    continue
                links_ct += 1
                if host_of(cu) != page["host"]:  # same-host predicate
                    continue
                is_digit = bool(re.match("^[0-9]+$", link["text"] or ""))

                def per_source_paging():
                    # per-source pagination (EngineConfig.paging_model;
                    # reference crawl.clj:358-390): the paging action
                    # and its {:only :avoid} refinement are keyed by
                    # the PARENT's action path; a refinement-failed
                    # link falls through to content eligibility
                    ent = paging_model.get(tuple(entry.get("path", ())))
                    if ent is None or link["xpath"] != ent[0]:
                        return False
                    toks = [
                        t for t in
                        re.sub(r"^[a-zA-Z]+://[^/]*/", "", cu).split("/")
                        if t
                    ]
                    _xp, only, avoid = ent
                    if any(t in avoid for t in toks):
                        return False
                    if only and not any(t in only for t in toks):
                        return False
                    return True

                if model_action_seq is not None:
                    # depth-indexed plan (xpath-to-pick, crawl.clj:200-202):
                    # the page's depth selects the one content action;
                    # past the last step nothing expands
                    is_paging = is_digit and (
                        per_source_paging()
                        if paging_model is not None
                        else link["xpath"] in paging_xpaths
                    )
                    d = entry.get("depth", 0)
                    action = (
                        model_action_seq[d] if d < len(model_action_seq) else None
                    )
                    if not is_paging and link["xpath"] != action:
                        continue
                    queue = "paging" if is_paging else "content"
                elif model_xpaths is not None:
                    # E3 harvest: model-inapplicable links are dropped
                    # after same-host, before the seen check (not dups —
                    # outside the plan)
                    is_paging = is_digit and (
                        per_source_paging()
                        if paging_model is not None
                        else link["xpath"] in paging_xpaths
                    )
                    if not is_paging and link["xpath"] not in model_xpaths:
                        continue
                    queue = "paging" if is_paging else "content"
                else:
                    queue = "paging" if is_digit else "content"
                if refine_only or refine_avoid:
                    # learned refinement — dropped before the seen check
                    # (engine apply_refinement mirror: URL path tokens
                    # after scheme://host/). :only restriction first
                    # (dom.clj:603-615): an xpath with an only-set keeps
                    # only hrefs carrying one of its tokens; then :avoid
                    # (dom.clj:617-631) drops avoid-token hits.
                    toks = re.sub(r"^[a-zA-Z]+://[^/]*/", "", cu).split("/")
                    on = (refine_only or {}).get(link["xpath"], ())
                    if on and not any(t in on for t in toks if t):
                        continue
                    av = (refine_avoid or {}).get(link["xpath"], ())
                    if any(t in av for t in toks if t):
                        continue
                if cu in res.url_seen:
                    dups_ct += 1
                    continue
                res.url_seen.add(cu)
                new_entries.append(
                    {"url": cu, "host": host_of(cu), "insertion_seq": next_seq,
                     "queue": queue, "src_xpath": link["xpath"],
                     "src_url": page["url"],
                     "depth": entry.get("depth", 0)
                     + (0 if queue == "paging" else 1),
                     "path": tuple(entry.get("path", ()))
                     + (() if queue == "paging" else (link["xpath"],))}
                )
                next_seq += 1
                enq_ct += 1
        if exemplar_sampling and new_entries:
            # E2 exemplar-cluster sampling (prepare-example,
            # crawl.clj:532-629; engine mirror in run_epoch): per
            # (source page, xpath) group — seeded sample max(10, n//4),
            # "download" (by_url lookup; a miss clusters as -1), single-
            # linkage cluster by caption char-freq cosine, ONE exemplar
            # per cluster enters the frontier. Every survivor stays in
            # URL-seen (already added above, :new-visited crawl.clj:625).
            from . import exemplar as _ex

            groups: dict = {}
            for e in new_entries:
                groups.setdefault((e["src_url"], e["src_xpath"]), []).append(e)
            exemplar_urls: set = set()
            for (src, xp), entries in sorted(groups.items()):
                sampled = _ex.sample_urls([e["url"] for e in entries])
                rows = [
                    (u, (by_url[u]["caption"] if u in by_url else None))
                    for u in sorted(sampled)
                ]
                assigned = _ex.cluster(rows, exemplar_threshold)
                for u in sorted(sampled):
                    cid, is_ex = assigned[u]
                    pg = by_url.get(u)
                    res.samples.append(dict(
                        epoch=epoch, src_url=src, src_xpath=xp, url=u,
                        cluster_id=cid, exemplar=is_ex,
                        is_leaf=(bool(pg["is_leaf"]) if pg else None),
                    ))
                    if is_ex:
                        exemplar_urls.add(u)
            new_entries = [e for e in new_entries if e["url"] in exemplar_urls]
        frontier.extend(new_entries)
        leaves_total += leaves_ct
        neardups_total += neardup_ct
        res.metrics.append(
            dict(epoch=epoch, urls_scheduled=len(selected), pages_fetched=fetched_ct,
                 links_extracted=links_ct, links_enqueued=enq_ct, dups_dropped=dups_ct,
                 disallowed_dropped=disallowed, leaves_fetched=leaves_ct,
                 neardup_fetched=neardup_ct)
        )
        res.epochs_run = epoch + 1
    return res


def multiseq_oracle(
    cfg: SynthConfig,
    seeds: list,
    robots: list,
    planned: list,
    budget: int,
    paging_xpaths: set = frozenset(),
    max_epochs: int = 10,
    epoch_ms: int = 30_000,
    **kw,
) -> tuple:
    """Sequential restatement of the multi-action-sequence budgeted
    executor (``main.clj:264-287``, ``execute.clj:59-86``; the Spark
    driver loop is ``crawler_spark.multiseq.execute_model_budget``):
    fold the ranked sequences under one shared budget — each sequence
    crawls from the same seeds with a fresh blacklist and
    ``max_pages = budget - spent`` (epoch-granular stop, the same rule
    the engine applies), ``spent`` grows by ``|visited|``, sequences
    reached after exhaustion are skipped (``None`` placeholder).
    Returns ``(runs, budget_spent)`` where runs[i] is the i-th
    sequence's OracleResult or None."""
    runs: list = []
    spent = 0
    for actions in planned:
        if budget - spent <= 0:
            runs.append(None)
            continue
        r = crawl_oracle(
            cfg, seeds, robots,
            max_epochs=max_epochs, epoch_ms=epoch_ms,
            max_pages=budget - spent,
            model_action_seq=list(actions),
            paging_xpaths=set(paging_xpaths),
            **kw,
        )
        spent += len(r.crawl_order)
        runs.append(r)
    return runs, spent
