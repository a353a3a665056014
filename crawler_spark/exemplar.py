"""E2 exemplar-cluster sampling — the reference's learning-crawl
sample-efficiency trick (``prepare-example``, ``crawl.clj:532-629``).

Per (source page, xpath) group of newly-discovered links, the reference

1. samples ``max(10, n/4)`` links (``crawl.clj:561-565`` random-take —
   here a SEEDED md5-order sample so engine, oracle, and SQL twin draw
   identically, the same determinism substitution SURVEY.md §7 applies
   to W6),
2. downloads the sampled targets (politeness-paced; a failed download
   drops out of clustering, ``crawl.clj:567-579``),
3. single-linkage-clusters the downloads by structural similarity —
   char-frequency cosine of the page text (``crawl.clj:585-589``;
   ``similarity/similar?``), and
4. enqueues ONE exemplar per cluster (``crawl.clj:590``) while EVERY
   group link still enters URL-seen (``:new-visited links-list``,
   ``crawl.clj:625``) — the frontier expands one representative per
   structural template instead of every sibling.

The pure-Python core here (sampling rule, char vectors, cosine,
single-linkage, exemplar pick) is shared VERBATIM by the sequential
oracle and by the engine's Arrow-batched ``applyInPandas`` stage — the
per-group clustering is genuinely iterative (union-find over pairwise
edges), which built-in DataFrame ops can't express without an O(P²)
blowup, so it rides the documented custom-operator path (b). All float
math stays exact for parity: letter counts are integers, so dot
products and norms are integer-valued doubles; IEEE sqrt/division are
correctly rounded and deterministic on both sides.

Determinism substitutions vs the reference (both documented above):
``random-take`` → md5-order sample; ``rand-nth`` exemplar →
lexicographically-smallest url of each cluster; clusters numbered by
their smallest url.
"""

from __future__ import annotations

import hashlib
import math

_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def md5_order_key(url: str) -> tuple:
    """Seeded sample order: the same 61-bit md5 prefix as
    operators.dedup.md5_hash61 / the _H61 SQL twin, tie-broken by url."""
    h = int(hashlib.md5(url.encode("utf-8")).hexdigest()[:15], 16)
    return (h, url)


def sample_size(n: int) -> int:
    """max(10, n/4) — crawl.clj:561-565 ((max 10 (int (/ n 4))))."""
    return max(10, n // 4)


def sample_urls(urls) -> set:
    """The seeded per-group sample: first max(10, n//4) urls in
    (md5-hash, url) order."""
    ordered = sorted(set(urls), key=md5_order_key)
    return set(ordered[: sample_size(len(ordered))])


def char_vec(text: str) -> list:
    """a-z letter counts of the lowercased text — the C4 char-frequency
    representation (operators/similarity.py char_freq_cosine_consec)."""
    low = text.lower()
    return [low.count(ch) for ch in _LETTERS]


def cosine(va: list, vb: list) -> float:
    """Integer-exact dot/norms → deterministic double on every side."""
    dot = sum(a * b for a, b in zip(va, vb))
    na = math.sqrt(sum(a * a for a in va))
    nb = math.sqrt(sum(b * b for b in vb))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return dot / (na * nb)


def cluster(rows, threshold: float) -> dict:
    """Single-linkage clustering of sampled downloads (crawl.clj:585-590).

    ``rows``: iterable of (url, text-or-None). Rows with None text (the
    download-miss analog) take cluster_id −1 and are never exemplars.
    Returns {url: (cluster_id, exemplar bool)}: clusters are connected
    components of the cosine ≥ threshold graph, numbered 0.. by their
    smallest url; the exemplar is each cluster's smallest url."""
    rows = list(rows)
    with_text = sorted(
        ((u, t) for u, t in rows if t is not None), key=lambda r: r[0]
    )
    out = {u: (-1, False) for u, t in rows if t is None}
    if not with_text:
        return out
    urls = [u for u, _t in with_text]
    vecs = [char_vec(t) for _u, t in with_text]
    parent = list(range(len(urls)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(len(urls)):
        for j in range(i + 1, len(urls)):
            if cosine(vecs[i], vecs[j]) >= threshold:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    comps: dict = {}
    for i, u in enumerate(urls):
        comps.setdefault(find(i), []).append(u)
    clusters = sorted((min(us), us) for us in comps.values())
    for cid, (rep, us) in enumerate(clusters):
        for u in us:
            out[u] = (cid, u == rep)
    return out


def assign_exemplars(sampled, threshold: float):
    """Spark stage: per-(src_url, src_xpath) group, cluster the sampled
    downloads and mark exemplars — Arrow-batched ``applyInPandas`` over
    the shared pure-Python core above (groups are bounded by the
    max(10, n//4) sample, so the pairwise step is tiny per group; the
    only shuffle is the groupBy on the group key).

    ``sampled``: DataFrame (src_url, src_xpath, url, caption nullable,
    is_leaf nullable). Returns (src_url, src_xpath, url, cluster_id,
    exemplar, is_leaf)."""
    import pandas as pd

    def per_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        assigned = cluster(
            zip(pdf["url"], pdf["caption"].where(pdf["caption"].notna(), None)),
            threshold,
        )
        cids, exes = [], []
        for u in pdf["url"]:
            cid, ex = assigned[u]
            cids.append(cid)
            exes.append(ex)
        return pd.DataFrame(
            {
                "src_url": pdf["src_url"],
                "src_xpath": pdf["src_xpath"],
                "url": pdf["url"],
                "cluster_id": cids,
                "exemplar": exes,
                "is_leaf": pdf["is_leaf"].astype("boolean"),
            }
        )

    return sampled.select(
        "src_url", "src_xpath", "url", "caption", "is_leaf"
    ).groupBy("src_url", "src_xpath").applyInPandas(
        per_group,
        "src_url string, src_xpath string, url string, cluster_id int, "
        "exemplar boolean, is_leaf boolean",
    )
