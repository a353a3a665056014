"""Structured Streaming twins: windowed counts and the stateful
politeness throttle, driven end-to-end with a file source + memory sink."""

import time

import pytest
from pyspark.sql import functions as F


def _drain(q, timeout=60):
    q.processAllAvailable()
    q.stop()


def test_stream_windowed_counts(spark, tmp_path):
    from crawler_spark.streaming import stream_windowed_counts

    src = tmp_path / "in"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(
            [
                '{"event_time": "2026-01-01T00:00:01", "host": "h1", "url": "u1"}',
                '{"event_time": "2026-01-01T00:00:02", "host": "h1", "url": "u2"}',
                '{"event_time": "2026-01-01T00:00:15", "host": "h2", "url": "u3"}',
            ]
        )
    )
    events = (
        spark.readStream.schema("event_time timestamp, host string, url string")
        .json(str(src))
    )
    out = stream_windowed_counts(events, window="10 seconds", watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append" if False else "complete")
        .start()
    )
    _drain(q)
    rows = spark.sql("select * from win_counts").collect()
    got = {(str(r.win_start), r.host): r.n_urls for r in rows}
    assert got[("2026-01-01 00:00:00", "h1")] == 2
    assert got[("2026-01-01 00:00:10", "h2")] == 1


def test_stream_tumbling_hourly_matches_batch(spark):
    """The streaming tumbling aggregate must be bit-identical to its
    batch twin on the same events table — that identity is what lets the
    driver hash the streaming query against the batch DuckDB oracle."""
    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    got = {
        tuple(r)
        for r in entry.q_stream_tumbling_hourly(spark, sf_dir).collect()
    }
    want = {tuple(r) for r in entry.q_tumbling_hourly(spark, sf_dir).collect()}
    assert got == want and len(got) > 0


def test_stream_politeness_throttle(spark, tmp_path):
    from crawler_spark.streaming import stream_politeness_throttle

    src = tmp_path / "in2"
    src.mkdir()
    (src / "urls.json").write_text(
        "\n".join(f'{{"host": "h1", "url": "u{i}"}}' for i in range(7))
        + "\n"
        + '{"host": "h2", "url": "v0"}'
    )
    urls = spark.readStream.schema("host string, url string").json(str(src))
    out = stream_politeness_throttle(urls, quota_per_trigger=5, drain_interval_ms=300)
    q = (
        out.writeStream.format("memory")
        .queryName("throttled")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    # poll: the timeout-armed query never quiesces for processAllAvailable
    # while a backlog is pending, so wait for the full release instead
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.sql("select count(*) c from throttled").collect()[0].c == 8:
                break
            time.sleep(1)
    finally:
        q.stop()
    rows = spark.sql("select * from throttled").collect()
    per_host = {}
    for r in rows:
        per_host.setdefault(r.host, []).append(r.url)
    # everything releases eventually, never more than quota per batch
    assert sorted(per_host["h1"]) == sorted(f"u{i}" for i in range(7))
    assert per_host["h2"] == ["v0"]
    assert all(r.released_in_batch <= 5 for r in rows)


def test_stream_politeness_throttle_drains_backlog(spark, tmp_path):
    """One burst larger than the quota must fully drain over subsequent
    triggers via the processing-time timeout — with NoTimeout the state
    function only ran on new input, so a quiet host starved forever."""
    from crawler_spark.streaming import stream_politeness_throttle

    src = tmp_path / "in3"
    src.mkdir()
    (src / "urls.json").write_text(
        "\n".join(f'{{"host": "h1", "url": "u{i}"}}' for i in range(12))
    )
    urls = spark.readStream.schema("host string, url string").json(str(src))
    out = stream_politeness_throttle(urls, quota_per_trigger=5, drain_interval_ms=300)
    q = (
        out.writeStream.format("memory")
        .queryName("drained")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline:
            n = spark.sql("select count(*) c from drained").collect()[0].c
            if n == 12:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert n == 12, f"backlog starved: only {n}/12 released"
    per = spark.sql("select released_in_batch from drained").collect()
    assert all(r.released_in_batch <= 5 for r in per)


def test_stream_seen_dedup_ttl_readmission(spark, tmp_path):
    """Streaming URL-seen semantics, pinned batch by batch: a live-state
    re-arrival is dropped; the eviction lags the watermark by one batch
    (the batch whose watermark passes a key's expiry still dedups it);
    the NEXT batch re-admits — the streaming twin of TTL recrawl."""
    import os
    import shutil

    stage = str(tmp_path / "seen_src")
    os.makedirs(stage)

    def write(name, rows, mtime):
        df = spark.createDataFrame(rows, "url string, t long").withColumn(
            "event_time", F.timestamp_seconds(F.col("t") + 1_000_000)
        )
        tmp = str(tmp_path / ("w_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = os.path.join(stage, name + ".parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (mtime, mtime))

    write("b0", [("A", 100), ("B", 120)], 1000)
    write("b1", [("X", 300)], 2000)        # watermark advancer → 240
    write("b2", [("A", 310)], 3000)        # wm(1)=240 >= A.exp(160), but
                                           # eviction runs at batch END:
                                           # still a duplicate
    write("b3", [("A", 320)], 4000)        # state gone → re-admitted
    write("b4", [("E", 100)], 5000)        # exp 160 <= wm: too late, dropped

    from crawler_spark.streaming.frontier_stream import stream_seen_dedup

    src = (
        spark.readStream.schema("url string, t long, event_time timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        stream_seen_dedup(src, delay="60 seconds")
        .select("url", "t")
        .writeStream.format("memory")
        .queryName("seen_ttl")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted((r.url, r.t) for r in spark.table("seen_ttl").collect())
    assert got == [("A", 100), ("A", 320), ("B", 120), ("X", 300)]
