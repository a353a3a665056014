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


def test_untouched_segments_bypass_merge(spark):
    """Touched-bucket-only maintenance: a bucket with no fresh rows must
    pass its existing segment through WITHOUT entering the Arrow merge
    stage. Proof: plant a sentinel bits blob of the WRONG length on the
    untouched buckets — the merge's frombuffer-OR would either raise or
    rewrite it; pass-through returns it byte-identical."""
    seen = _mk(spark, [f"http://h.test/p/{i}" for i in range(400)])
    segs = build_segments(seen, None, M_BITS)
    base = {r.partition_id: bytes(r.bits) for r in segs.collect()}
    assert set(base) == set(range(N_BUCKETS))

    sentinel = b"\x7f"  # 1 byte — invalid inside the m_bits//8 merge
    fresh = _mk(spark, [f"http://h.test/p/{i}" for i in range(400, 1400)]).filter(
        F.col("partition_id") == 3
    )
    assert fresh.count() > 0
    doctored = spark.createDataFrame(
        [
            (pid, bits if pid == 3 else sentinel, 400)
            for pid, bits in base.items()
        ],
        "partition_id int, bits binary, n_items long",
    )
    out = {r.partition_id: bytes(r.bits) for r in build_segments(
        fresh, doctored, M_BITS
    ).collect()}
    assert set(out) == set(range(N_BUCKETS))
    for pid in range(N_BUCKETS):
        if pid == 3:
            assert len(out[pid]) == M_BITS // 8
            assert out[pid] != base[pid], "touched bucket must change"
        else:
            assert out[pid] == sentinel, f"bucket {pid} entered the merge"
