"""URL-seen anti-join: exactness of the scan-only (broadcast-probe)
shape vs the plain shuffle join, and the plan contract — the seen table
is scanned, never shuffled."""

from pyspark.sql import functions as F

from crawler_spark.plans import explain_str
from crawler_spark.seen import anti_join_seen, bucket_expr, build_segments

N_BUCKETS, M_BITS = 8, 1 << 16


def _mk(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"]).withColumn(
        "url_hash", F.xxhash64("url")
    )
    return df.withColumn("partition_id", bucket_expr(F.col("url_hash"), N_BUCKETS))


def test_scan_only_matches_shuffle_join(spark):
    seen = _mk(spark, [f"http://h.test/p/{i}" for i in range(0, 3000, 2)])
    cand = _mk(spark, [f"http://h.test/p/{i}" for i in range(1000, 1400)])
    for segments in (None, build_segments(seen, None, M_BITS)):
        fast = anti_join_seen(cand, seen, segments, M_BITS, broadcast_probe=True)
        slow = anti_join_seen(cand, seen, segments, M_BITS, broadcast_probe=False)
        got = sorted(r.url for r in fast.collect())
        want = sorted(r.url for r in slow.collect())
        assert got == want
        # odd ids are new, even ids are seen
        assert got == sorted(f"http://h.test/p/{i}" for i in range(1001, 1400, 2))


def test_seen_side_never_shuffles(spark):
    """The plan contract at 10^10 rows: the seen table's exact-membership
    probe must be broadcast hash joins (seen streams), with no
    SortMergeJoin anywhere in the anti-join subtree."""
    seen = _mk(spark, [f"http://h.test/p/{i}" for i in range(100)])
    cand = _mk(spark, [f"http://h.test/p/{i}" for i in range(50, 70)])
    plan = explain_str(anti_join_seen(cand, seen, None, M_BITS))
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
