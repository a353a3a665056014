"""Link extraction — the reference's DOM link pipeline as DataFrame ops.

Reference pipeline (``dom.clj:311-369``): walk anchors → drop
``rel=nofollow`` / ``javascript:`` → resolve+canonicalize → blacklist →
same-host filter (``dom.clj:353``). Here pages already carry their parsed
anchor array (``out_links``: the synthetic web's stand-in for P1-P3 HTML
parsing, which for real HTML would be a selectolax/lxml ``mapInPandas``
stage), so extraction is: ``posexplode`` (JVM) → column-expression
canonicalization (JVM, whole-stage codegen) → filters. Zero Python.

Candidate identity for deterministic ordering is ``(parent dequeue seq,
link position)`` — posexplode preserves array order, giving the same
within-page order the reference's sequential walk produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .canon import canonicalize_expr, host_of_expr


# P8: the reference defines this ignore regex but never applies it
# (dom.clj:302); the engine makes it an explicit, optional filter. The
# graft crawls image pages, so callers may also *invert* it to keep only
# asset URLs.
DEFAULT_IGNORE_EXTENSIONS = ("jpg", "jpeg", "css", "gif", "png", "xml")


def extension_filter(
    df: DataFrame,
    url_col: str = "url",
    extensions: tuple = DEFAULT_IGNORE_EXTENSIONS,
    keep_matching: bool = False,
) -> DataFrame:
    """Drop (or with keep_matching=True, keep only) URLs whose path ends
    in one of *extensions*."""
    pat = r"(?i)\.(" + "|".join(extensions) + r")([?#].*)?$"
    matches = F.col(url_col).rlike(pat)
    return df.filter(matches if keep_matching else ~matches)


def extract_candidates(fetched: DataFrame, dedup: bool = True) -> DataFrame:
    """fetched: (seq, url, host, out_links, ...) → candidate links.

    Returns (src_seq, pos, src_url, src_text, src_xpath, host, url)
    after nofollow/javascript/canonicalize/same-host filters; with
    ``dedup`` (default) also deduped within the batch keeping the first
    occurrence in (src_seq, pos) order — exactly what sequential
    processing would keep. ``dedup=False`` keeps every occurrence (the
    oracle's dup-counting semantics need the multiplicity).
    """
    # NOTE: depth rides the candidate stream (an int, and the harvest
    # mode's depth-indexed filter needs it pre-seen-check); the action
    # PATH deliberately does not — duplicating an array per exploded
    # link row through the dedup shuffle and the Arrow seen probe is
    # measurable waste, so the engine re-attaches paths to survivors
    # with a broadcast join on src_seq against the quota-bounded batch.
    pass_cols = [c for c in ("depth",) if c in fetched.columns]
    passthrough = [F.col(c).alias(f"src_{c}") for c in pass_cols]
    links = fetched.select(
        F.col("seq").alias("src_seq"),
        F.col("url").alias("src_url"),
        F.col("host").alias("src_host"),
        *passthrough,
        F.posexplode("out_links").alias("pos", "link"),
    )
    links = links.filter(~F.col("link.nofollow"))
    links = links.withColumn(
        "canon_url", canonicalize_expr(F.col("link.href"), F.col("src_url"))
    ).filter(F.col("canon_url").isNotNull())
    # links_extracted metric is counted at this point (post-canonicalize,
    # pre-same-host) to match the oracle's links_ct
    links = links.withColumn("link_host", host_of_expr(F.col("canon_url")))
    same_host = links.filter(F.col("link_host") == F.col("src_host"))

    if dedup:
        w = Window.partitionBy("canon_url").orderBy("src_seq", "pos")
        same_host = (
            same_host.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    # digit-anchored links are pagination candidates → paging queue
    # (corpus.clj:127-131 digit-anchor rule feeding the dual queue)
    return same_host.select(
        "src_seq",
        "pos",
        "src_url",
        *[f"src_{c}" for c in pass_cols],
        F.col("link.text").alias("src_text"),
        F.col("link.xpath").alias("src_xpath"),
        F.col("link_host").alias("host"),
        F.col("canon_url").alias("url"),
        F.when(F.col("link.text").rlike("^[0-9]+$"), F.lit("paging"))
        .otherwise(F.lit("content"))
        .alias("queue"),
    )


def count_extracted(fetched: DataFrame) -> DataFrame:
    """links_extracted per the oracle's definition: non-nofollow,
    canonicalizable links (before the same-host filter)."""
    links = fetched.select(
        F.col("url").alias("src_url"), F.explode("out_links").alias("link")
    ).filter(~F.col("link.nofollow"))
    return links.filter(
        canonicalize_expr(F.col("link.href"), F.col("src_url")).isNotNull()
    )
