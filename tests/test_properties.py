"""Property-based tests (hypothesis) for the oracle/engine contracts the
whole exactness story rests on: hashing and canonicalization must agree
between the pure-Python oracle implementations and Spark's JVM versions
for ARBITRARY inputs, not just the fixture matrix. (The reference has no
property tests at all — SURVEY.md §5.)

Strategy: hypothesis generates the cases; each test collects them into
ONE Spark job (batched round-trip, not per-example jobs)."""

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from crawler_spark.canon import canonicalize, canonicalize_expr
from crawler_spark.hashing import xxhash64

# printable-ish URLs/strings; exclude surrogates (invalid UTF-8)
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=120,
)
HREF_CHARS = string.ascii_letters + string.digits + ":/.#?&%=_-~"
HREF = st.text(alphabet=HREF_CHARS, max_size=80)
BASE = st.sampled_from(
    [
        "http://hostA.test/p/3/page",
        "https://b.example.org:8080/x/y/z",
        "http://c.test/",
    ]
)


def _batch(spark, pairs):
    """One Spark job for all examples: (href, base) → canon column."""
    df = spark.createDataFrame(pairs, ["href", "base"]).select(
        "href", "base", canonicalize_expr(F.col("href"), F.col("base")).alias("canon")
    )
    return [(r.href, r.base, r.canon) for r in df.collect()]


def test_canonicalize_spark_matches_python_on_random_hrefs(spark):
    cases = []

    @settings(max_examples=300, deadline=None)
    @given(HREF, BASE)
    def collect(href, base):
        cases.append((href, base))

    collect()
    for href, base, got in _batch(spark, cases):
        assert got == canonicalize(href, base), (href, base)


def test_xxhash64_matches_spark_on_random_strings(spark):
    cases = []

    @settings(max_examples=300, deadline=None)
    @given(TEXT)
    def collect(s):
        cases.append((s,))

    collect()
    df = spark.createDataFrame(cases, ["s"]).select("s", F.xxhash64("s").alias("h"))
    for r in df.collect():
        assert xxhash64(r.s.encode("utf-8")) == r.h, repr(r.s)


def test_canonicalize_idempotent(spark):
    """canon(canon(x)) == canon(x) for any resolvable href — a crawl
    invariant: re-canonicalizing frontier rows must be a no-op."""
    cases = []

    @settings(max_examples=200, deadline=None)
    @given(HREF, BASE)
    def collect(href, base):
        cases.append((href, base))

    collect()
    for href, base, first in _batch(spark, cases):
        if first is not None:
            assert canonicalize(first, first) == first, (href, base, first)
