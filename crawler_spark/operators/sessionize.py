"""Sessionization + event-time windowed aggregation (batch form).

The reference has no streaming concepts (SURVEY.md §2.10) — these are the
engine's additions for the events table. The batch forms here are exact
and SQL-oracle-checkable; :mod:`crawler_spark.streaming` carries the
Structured Streaming equivalents (watermark + window, and the stateful
``applyInPandasWithState`` politeness throttle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the previous event of
    the same user is more than *gap_minutes* older. Classic lag + running
    count — two windows over the same (user, ts) partitioning, one
    shuffle total."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    prev = F.lag(ts_col).over(w)
    new_sess = (
        F.when(prev.isNull(), 1)
        .when(
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev) > gap_minutes * 60, 1
        )
        .otherwise(0)
    )
    run = Window.partitionBy(user_col).orderBy(ts_col, "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("__new", new_sess).withColumn(
        "session_id", F.sum("__new").over(run)
    ).drop("__new")


def session_stats(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session aggregate: length, bounds, value sum."""
    s = sessionize(df, gap_minutes=gap_minutes)
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        F.sum("value").alias("sum_value"),
    )


def tumbling_window_agg(df: DataFrame, minutes: int = 60) -> DataFrame:
    """Event-time tumbling window counts/sums per event_type (batch twin
    of the streaming windowed agg)."""
    bucket = F.date_trunc("hour", F.col("ts")) if minutes == 60 else F.timestamp_seconds(
        (F.unix_timestamp("ts") / (minutes * 60)).cast("long") * (minutes * 60)
    )
    return df.groupBy(bucket.alias("win_start"), "event_type").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("sum_value"),
    )
