"""PO3 host-skew: the politeness window must stay correct and complete
when one host holds ~90% of the pending frontier (the Zipf-head case
salting/AQE exist for, SURVEY.md §2.12)."""

from pyspark.sql import functions as F

from crawler_spark.politeness import dequeue
from crawler_spark.schema import ROBOTS_SCHEMA


def test_politeness_under_heavy_host_skew(spark):
    n_hot, n_cold_hosts = 20_000, 20
    hot = spark.range(n_hot).select(
        F.concat(F.lit("http://hot.test/p/"), F.col("id")).alias("url"),
        F.xxhash64("id").alias("url_hash"),
        F.lit("hot.test").alias("host"),
        F.lit(None).cast("string").alias("src_url"),
        F.lit(None).cast("string").alias("src_text"),
        F.lit(None).cast("string").alias("src_xpath"),
        F.lit(0).alias("epoch_added"),
        F.col("id").alias("insertion_seq"),
        F.lit("content").alias("queue"),
    )
    cold = spark.range(n_cold_hosts).select(
        F.concat(F.lit("http://cold"), F.col("id"), F.lit(".test/p/0")).alias("url"),
        F.xxhash64("id").alias("url_hash"),
        F.concat(F.lit("cold"), F.col("id"), F.lit(".test")).alias("host"),
        F.lit(None).cast("string").alias("src_url"),
        F.lit(None).cast("string").alias("src_text"),
        F.lit(None).cast("string").alias("src_xpath"),
        F.lit(0).alias("epoch_added"),
        (F.col("id") + n_hot).alias("insertion_seq"),
        F.lit("content").alias("queue"),
    )
    frontier = hot.unionByName(cold)
    robots_rows = [("hot.test", [], 1000)] + [
        (f"cold{i}.test", [], 1000) for i in range(n_cold_hosts)
    ]
    robots = spark.createDataFrame(robots_rows, ROBOTS_SCHEMA)

    selected, rest = dequeue(frontier, robots, epoch_ms=10_000)  # quota 10/host
    per_host = {r["host"]: r["n"] for r in
                selected.groupBy("host").agg(F.count("*").alias("n")).collect()}
    # quota enforced on the hot host despite 1000x skew; cold hosts all served
    assert per_host["hot.test"] == 10
    assert sum(1 for h in per_host if h.startswith("cold")) == n_cold_hosts
    assert all(v <= 10 for v in per_host.values())
    # hot host selection is its 10 smallest insertion_seqs (FIFO held)
    hot_sel = sorted(
        r.insertion_seq for r in selected.filter(F.col("host") == "hot.test").collect()
    )
    assert hot_sel == list(range(10))
    assert rest.count() == n_hot + n_cold_hosts - len(per_host) * 0 - selected.count()


def test_mega_host_single_backlog(spark):
    """10⁶ pending rows on ONE host (3 orders beyond the skew test): the
    two-phase salted top-k must still pick exactly the quota-many
    smallest insertion_seqs, with no task ever sorting the full backlog
    (phase 1 partitions by (host, salt))."""
    n = 1_000_000
    frontier = spark.range(n).select(
        F.concat(F.lit("http://mega.test/p/"), F.col("id")).alias("url"),
        F.xxhash64("id").alias("url_hash"),
        F.lit("mega.test").alias("host"),
        F.lit(None).cast("string").alias("src_url"),
        F.lit(None).cast("string").alias("src_text"),
        F.lit(None).cast("string").alias("src_xpath"),
        F.lit(0).alias("epoch_added"),
        # non-contiguous, shuffled-looking seqs: selection must be by
        # rank, not by any "min + c·quota" shortcut
        (F.col("id") * 7 % n).alias("insertion_seq"),
        F.lit("content").alias("queue"),
    )
    robots = spark.createDataFrame([("mega.test", [], 500)], ROBOTS_SCHEMA)
    selected, rest = dequeue(frontier, robots, epoch_ms=10_000, n_salts=16)
    got = sorted(r.insertion_seq for r in selected.collect())
    assert got == list(range(20))  # quota = 10000/500 = 20, exact FIFO
    assert rest.count() == n - 20
