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
    out = stream_politeness_throttle(urls, quota_per_trigger=5)
    q = (
        out.writeStream.format("memory")
        .queryName("throttled")
        .outputMode("append")
        .start()
    )
    _drain(q)
    rows = spark.sql("select * from throttled").collect()
    per_host = {}
    for r in rows:
        per_host.setdefault(r.host, []).append(r.url)
    # first trigger releases ≤5 per host; h1 backlog (2 urls) stays in state
    assert len(per_host["h1"]) <= 5
    assert per_host["h2"] == ["v0"]
