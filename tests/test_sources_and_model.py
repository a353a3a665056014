"""Sources/sinks + xpath refinement and pagination-detection operators."""

import json

from pyspark.sql import functions as F

from crawler_spark.operators import xpath_model
from crawler_spark.sources import read_seed_list, write_corpus_json, write_table


def test_read_seed_list(spark, tmp_path):
    f = tmp_path / "seeds.txt"
    f.write_text("# c\nhttp://a.test/\n\nhttp://b.test/x\nhttp://a.test/2\n")
    rows = read_seed_list(spark, str(f)).orderBy("ord").collect()
    assert [r.url for r in rows] == ["http://a.test/", "http://b.test/x", "http://a.test/2"]
    assert [r.ord for r in rows] == [0, 1, 2]


def test_write_corpus_json(spark, tmp_path):
    from crawler_spark.synth import SynthConfig, corpus_df

    cfg = SynthConfig(n_pages=20, n_hosts=3, with_images=True)
    out = tmp_path / "corpus_json"
    write_corpus_json(corpus_df(spark, cfg).select("image_id", "bytes", "caption"), str(out))
    back = spark.read.json(str(out))
    assert back.count() == 20
    row = back.filter(F.col("image_id") == "img-42-00000000").first()
    assert bytes.fromhex(row.bytes)[:4] == b"SGI1"  # hex round-trip


def test_write_table_partitioned(spark, tmp_path):
    df = spark.range(100).withColumn("part", (F.col("id") % 4).cast("int"))
    write_table(df, str(tmp_path / "t"), partition_by=["part"])
    back = spark.read.parquet(str(tmp_path / "t"))
    assert back.count() == 100
    assert (tmp_path / "t" / "part=0").exists()


def test_refine_xpaths(spark):
    rows = [
        ("xp1", "http://h.test/thread/1", True),
        ("xp1", "http://h.test/thread/2", True),
        ("xp1", "http://h.test/profile/9", False),
        ("xp2", "http://h.test/page/1", True),
    ]
    df = spark.createDataFrame(rows, ["xpath", "href", "good"])
    out = {r.xpath: (r.only, r.avoid) for r in xpath_model.refine_xpaths(df).collect()}
    only1, avoid1 = out["xp1"]
    assert "thread" in only1 and "profile" in avoid1 and "9" in avoid1
    assert out["xp2"][1] == []  # no bad examples → nothing avoided

    refined = xpath_model.apply_refinement(
        df.select("xpath", "href"), xpath_model.refine_xpaths(df)
    )
    kept = {r.href for r in refined.collect()}
    assert "http://h.test/profile/9" not in kept
    assert "http://h.test/thread/1" in kept


def test_detect_pagination(spark):
    # page A links: digit anchors to page B; A and B share link structure
    rows = [
        ("A", "pager", "B", "2", 0),
        ("A", "nav", "H", "home", 1),
        ("B", "pager", "C", "3", 0),
        ("B", "nav", "H", "home", 1),
        ("C", "other", "Z", "zzz", 0),
    ]
    df = spark.createDataFrame(rows, ["page_url", "xpath", "href", "text", "pos"])
    out = xpath_model.detect_pagination(df, min_cosine=0.9).collect()
    got = {(r.page_url, r.next_href) for r in out}
    assert ("A", "B") in got  # A→B: structurally similar, digit anchor
    # B→C: C's signature ({other:1}) shares no xpath with B → no sim row
    assert ("B", "C") not in got
