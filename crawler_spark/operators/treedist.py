"""C3: RTDM tree-edit distance over DOM structures (SURVEY.md §2.9).

The reference computes page structural similarity as
``1 - RTDM(t1, t2) / (|t1| + |t2|)`` with unit costs
(``/root/reference/src/crawler/similarity.clj:7-125``,
``tree-edit-distance-html``), feeding pagination detection
(``corpus.clj:133-138``). This is a clean re-implementation of the
restricted top-down mapping distance (Reis et al., "Automatic web news
extraction using tree edit distance", WWW 2004) — the published
algorithm the reference's code is derived from — rather than a
transliteration: the Clojure version's child-forest threading makes its
leaf checks unreachable, so the paper, not the port, is the spec.

RTDM restricts mappings to be top-down: a node pair can match only if
their parents match, so mismatched roots cost a full
replace. The child-forest DP uses subtree-sized delete/insert costs and
recursive alignment for same-tag pairs.

Spark shape: tree building + DP are per-pair Python (inherently so — the
reference runs one JVM DP per pair too); the operator runs as an
Arrow-batched ``applyInPandas``-free ``mapInPandas`` over an equi-joined
pair table, so at cluster scale it is an embarrassingly parallel map
stage. Pair GENERATION must stay blocked (consecutive pages, same-host
pages, LSH candidates) — never all-pairs.
"""

from __future__ import annotations

from ..dom import Node, parse_html


def tree_size(t: Node) -> int:
    """Number of nodes in the subtree (the node itself + descendants)."""
    return 1 + sum(tree_size(c) for c in t.children)


def rtdm_distance(t1: Node, t2: Node) -> int:
    """Restricted top-down edit distance, unit costs: delete/insert a
    whole subtree costs its size; two nodes align only if their tags
    match (then their child forests align recursively); mismatched tags
    cost a full replace (delete + insert)."""
    sizes: dict = {}

    def size(t):
        if id(t) not in sizes:
            sizes[id(t)] = 1 + sum(size(c) for c in t.children)
        return sizes[id(t)]

    memo: dict = {}

    def dist(a, b):
        key = (id(a), id(b))
        if key in memo:
            return memo[key]
        if a.tag != b.tag:
            d = size(a) + size(b)
        else:
            ca, cb = a.children, b.children
            m, n = len(ca), len(cb)
            # forest alignment DP: M[i][j] = cost of aligning first i
            # children of a with first j children of b
            prev = [0] * (n + 1)
            for j in range(1, n + 1):
                prev[j] = prev[j - 1] + size(cb[j - 1])
            for i in range(1, m + 1):
                cur = [prev[0] + size(ca[i - 1])] + [0] * n
                for j in range(1, n + 1):
                    cur[j] = min(
                        prev[j] + size(ca[i - 1]),      # delete child i
                        cur[j - 1] + size(cb[j - 1]),   # insert child j
                        prev[j - 1] + dist(ca[i - 1], cb[j - 1]),  # align
                    )
                prev = cur
            d = prev[n]
        memo[key] = d
        return d

    return dist(t1, t2)


def rtdm_similarity_html(src1: str, src2: str) -> float:
    """1 - dist/(|t1|+|t2|) over parsed pages — the reference's
    ``tree-edit-distance-html`` contract (similarity.clj:105-116):
    1.0 for identical structure, → 0 for disjoint, nil-safe 0.0."""
    if src1 is None or src2 is None:
        return 0.0
    t1, t2 = parse_html(src1), parse_html(src2)
    # descendant counts exclude the #document roots; the root-forest DP's
    # worst case (delete everything, insert everything) is exactly s1+s2,
    # so similarity lands in [0, 1]
    s1, s2 = tree_size(t1) - 1, tree_size(t2) - 1
    if s1 + s2 == 0:
        return 1.0
    return 1.0 - rtdm_distance(t1, t2) / (s1 + s2)


def rtdm_consec_pairs(df, html_col: str, id_col: str):
    """(id, html) → (id, rtdm) where rtdm is the structural similarity
    of page id vs page id+1 (the C5-style consecutive-pair blocking the
    reference applies at corpus.clj:133-138). Equi-join forms the pairs
    (never all-pairs); one mapInPandas computes the per-pair DP."""
    import pandas as pd
    from pyspark.sql import functions as F

    a = df.select(F.col(id_col).alias("id"), F.col(html_col).alias("html_a"))
    b = df.select(
        (F.col(id_col) - 1).alias("id"), F.col(html_col).alias("html_b")
    )
    pairs = a.join(b, "id")

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "rtdm": [
                        rtdm_similarity_html(x, y)
                        for x, y in zip(pdf["html_a"], pdf["html_b"])
                    ],
                }
            )

    return pairs.mapInPandas(gen, "id long, rtdm double")
