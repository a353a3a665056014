"""P8 extension filter + W3 deepest-paging promotion order."""

from pyspark.sql import functions as F

from crawler_spark.extract import extension_filter


def test_extension_filter(spark):
    urls = [
        "http://h.test/a/page",
        "http://h.test/a/img.JPG",
        "http://h.test/style.css?v=2",
        "http://h.test/feed.xml#top",
        "http://h.test/jpg/notafile",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    kept = {r.url for r in extension_filter(df).collect()}
    assert kept == {"http://h.test/a/page", "http://h.test/jpg/notafile"}
    assets = {r.url for r in extension_filter(df, keep_matching=True).collect()}
    assert "http://h.test/a/img.JPG" in assets and len(assets) == 3


def test_deepest_paging_promoted_first(spark):
    """W3: when a host dequeues from its paging queue, the entry with the
    longest src_xpath wins the quota slot (crawl.clj:437-443)."""
    from crawler_spark.politeness import dequeue
    from crawler_spark.schema import ROBOTS_SCHEMA

    frontier = spark.createDataFrame(
        [
            ("http://h.test/p1", 1, "h.test", None, None, "//a", 0, 10, "paging"),
            ("http://h.test/p2", 2, "h.test", None, None, "//div[contains(@class,'x')]/a", 0, 11, "paging"),
            ("http://h.test/p3", 3, "h.test", None, None, "//b/a", 0, 12, "paging"),
        ],
        "url string, url_hash long, host string, src_url string, src_text string, "
        "src_xpath string, epoch_added int, insertion_seq long, queue string",
    )
    robots = spark.createDataFrame(
        [("h.test", [], 1000)], ROBOTS_SCHEMA
    )
    # quota 1 → only the deepest-xpath entry is selected
    selected, rest = dequeue(frontier, robots, epoch_ms=1000)
    got = [r.url for r in selected.collect()]
    assert got == ["http://h.test/p2"]
    assert rest.count() == 2
