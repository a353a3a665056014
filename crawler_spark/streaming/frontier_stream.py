"""Structured Streaming view of the frontier (SURVEY.md §2.10).

The reference's loop state (queue/visited/counters, ``crawl.clj:323``)
is exactly streaming state; per north_rule the production engine models
epochs as batches over snapshot tables, but a continuously-arriving
frontier (e.g. link discoveries from a live fetch fleet) is naturally a
stream. These jobs are the streaming twins of the batch operators:

* ``stream_windowed_counts`` — watermark + tumbling-window per-host
  discovery rates (late data handled by the watermark);
* ``stream_politeness_throttle`` — ``applyInPandasWithState``: per-host
  token-bucket that emits at most quota URLs per trigger and carries the
  backlog in state — the custom stateful operator slot the reference
  fills with its recursive loop accumulators.

Tested with a MemoryStream-style rate source + memory sink
(tests/test_streaming.py); on a cluster the source becomes Kafka/Iceberg
CDC with identical transformations.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_windowed_counts(events: DataFrame, window: str = "10 seconds",
                           watermark: str = "30 seconds") -> DataFrame:
    """Per-host discovered-URL counts in event-time tumbling windows."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("win"), "host")
        .agg(F.count("*").alias("n_urls"))
        .select(F.col("win.start").alias("win_start"), "host", "n_urls")
    )


def stream_tumbling_hourly(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``tumbling_hourly`` contract query:
    event-time 1-hour tumbling windows per event_type, count + fixed-point
    value sum. ``F.window`` aligns 1-hour windows to the epoch, so
    ``win.start == date_trunc('hour', ts)`` and the output is bit-identical
    to the batch aggregate — which is exactly what lets the driver hash it
    against the same DuckDB oracle. win_start is emitted as a formatted
    string (round-1 lesson: timestamps don't survive every normalizer)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias(
                "sum_value_fp"
            ),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            "event_type",
            "n",
            "sum_value_fp",
        )
    )


def stream_seen_dedup(urls: DataFrame, delay: str = "60 seconds") -> DataFrame:
    """Streaming URL-seen: first occurrence per url within the watermark
    horizon (``dropDuplicatesWithinWatermark``) — the streaming twin of
    the batch engine's J1 anti-join WITH its TTL recrawl story
    (`EngineConfig.recrawl_ttl_epochs`): a url re-arriving while its
    state lives is a duplicate and is dropped; once the event-time
    watermark passes ``first_seen + delay`` the key is evicted and the
    url is admitted again — exactly a TTL re-crawl, with state bounded
    by the horizon instead of growing forever like plain
    ``dropDuplicates`` (the property that matters at a 10^10-URL
    frontier: the streaming seen-store holds only keys younger than the
    horizon, so memory is rate × delay, not corpus size).

    Microbatch semantics (empirically pinned, tests + oracle): during
    batch b the operator filters rows with ``t + delay <= wm(b-1)``
    (too late), checks duplicates against state BEFORE evicting, and
    evicts at batch END with wm(b-1) — so a key the watermark just
    passed still dedups batch b and re-admits from batch b+1. Dropped
    duplicates do NOT refresh state expiry, and every input row
    (emitted or dropped) advances the watermark."""
    return urls.withWatermark("event_time", delay).dropDuplicatesWithinWatermark(
        ["url"]
    )


def stream_host_rates(events: DataFrame) -> DataFrame:
    """Running per-host totals (complete-mode aggregate)."""
    return events.groupBy("host").agg(F.count("*").alias("total_urls"))


_THROTTLE_OUT = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("released_in_batch", T.IntegerType()),
    ]
)
_THROTTLE_STATE = T.StructType(
    [T.StructField("backlog", T.ArrayType(T.StringType()))]
)


def _throttle_fn(quota: int, timeout_ms: int | None, order_col: str | None = None):
    def fn(key, pdf_iter, state: GroupState):
        (host,) = key
        backlog = list(state.get[0]) if state.exists else []
        if not state.hasTimedOut:
            fresh = []
            for pdf in pdf_iter:
                if order_col is None:
                    fresh.extend((None, u) for u in pdf["url"].tolist())
                else:
                    fresh.extend(
                        zip(pdf[order_col].tolist(), pdf["url"].tolist())
                    )
            if order_col is not None:
                # deterministic FIFO within the batch: grouped iterator
                # chunk order is not guaranteed, the order column is
                fresh.sort(key=lambda t: t[0])
            backlog.extend(u for _, u in fresh)
        release, backlog = backlog[:quota], backlog[quota:]
        state.update((backlog,))
        if backlog and timeout_ms is not None:
            # re-arm: a host whose input goes quiet must still get
            # invoked next interval to drain what it parked — with
            # NoTimeout the state function only runs on NEW input for
            # the host, so a one-burst backlog would starve forever.
            # timeout_ms=None disables the re-arm (single-drain mode —
            # an AvailableNow trigger would otherwise spin timeout
            # batches until every backlog empties)
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "host": [host] * len(release),
                "url": release,
                "released_in_batch": [len(release)] * len(release),
            }
        )

    return fn


def stream_politeness_throttle(
    urls: DataFrame,
    quota_per_trigger: int = 5,
    drain_interval_ms: int | None = 1000,
    order_col: str | None = None,
) -> DataFrame:
    """Custom stateful operator: per-host token bucket. Each invocation
    emits ≤ quota URLs per host (FIFO) and keeps the rest in group
    state; a processing-time timeout re-invokes hosts that still hold a
    backlog even when no new URLs arrive for them — the streaming form
    of politeness.dequeue (and the crawl-delay analog: one quota batch
    per drain interval). ``order_col`` fixes the within-batch FIFO order
    (the grouped-iterator chunk order is not guaranteed) — required for
    a deterministic, oracle-checkable drain.

    ``drain_interval_ms=None`` is single-drain mode: NoTimeout — merely
    declaring ProcessingTimeTimeout makes an AvailableNow run keep
    scheduling no-data batches to service potential timers, so the
    one-shot drain would spin forever."""
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if drain_interval_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return urls.groupBy("host").applyInPandasWithState(
        _throttle_fn(quota_per_trigger, drain_interval_ms, order_col),
        outputStructType=_THROTTLE_OUT,
        stateStructType=_THROTTLE_STATE,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
