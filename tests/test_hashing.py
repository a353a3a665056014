"""Pure-python XXH64 must equal Spark's F.xxhash64 — the oracle/engine
hash contract (crawler_spark/hashing.py)."""

from pyspark.sql import functions as F

from crawler_spark.hashing import url_hash, xxhash64


def test_xxhash64_matches_spark(spark):
    samples = [
        "",
        "a",
        "ab",
        "abc",
        "abcd",
        "abcdefg",
        "abcdefgh",
        "http://host1.test/p/3/img-42-00000007",
        "x" * 31,
        "x" * 32,
        "x" * 33,
        "x" * 100,
        "日本語テスト",
        "mixed-ascii-和-text/with/path?q=1",
    ]
    df = spark.createDataFrame([(s,) for s in samples], ["s"]).select(
        "s", F.xxhash64("s").alias("h")
    )
    for row in df.collect():
        assert xxhash64(row.s.encode("utf-8")) == row.h, row.s


def test_url_hash_stable():
    assert url_hash("http://host0.test/") == url_hash("http://host0.test/")
    assert url_hash("http://host0.test/a") != url_hash("http://host0.test/b")
