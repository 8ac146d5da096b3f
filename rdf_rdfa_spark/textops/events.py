"""Event-stream analytics over the events table: time bucketing,
gap-based sessionization (window functions), JSON property access.

The reference has no streaming/temporal operators (SURVEY.md §2.8);
these are the training-data-pipeline temporal ops the engine needs at
corpus scale. All JVM expressions; each has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def hourly_counts(events: DataFrame) -> DataFrame:
    """Events per (hour, event_type) with value cents (exact ints)."""
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.floor(F.sum(F.col("value") * 100)).cast("long").alias("value_cents"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds the threshold. Returns sessions per user.
    One shuffle on user_id; the running session counter is a window
    cumulative sum (no driver loop)."""
    w = Window.partitionBy("user_id").orderBy("ts")
    # microsecond precision: unix_timestamp() truncates to seconds,
    # which silently disagrees with fractional-seconds semantics
    # (DuckDB epoch()) for gaps straddling the threshold boundary.
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = micros - F.lag(micros).over(w)
    flagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1)
        .otherwise(0),
    )
    return (
        flagged.groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"),
             F.count("*").alias("n_events"))
    )


def session_windows(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session aggregation with Spark's NATIVE session_window —
    the same groupBy works unchanged under Structured Streaming
    (stateful session merging with watermark eviction), unlike the
    lag/cumsum formulation in :func:`sessionize` which is batch-only.
    Returns (user_id, session_start, n_events, value_cents)."""
    return (
        events.groupBy(
            "user_id",
            F.session_window("ts", "%d minutes" % gap_minutes),
        )
        .agg(
            F.count("*").alias("n_events"),
            # per-event integer cents, then an integer sum — exact and
            # independent of partial-aggregation merge order (a float
            # SUM then floor would be partition-order-sensitive)
            F.sum(F.floor(F.col("value") * 100).cast("long"))
            .alias("value_cents"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "value_cents",
        )
    )


def props_key_counts(events: DataFrame) -> DataFrame:
    """JSON property access: distribution of props.k modulo 10."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.withColumn("k_mod", F.pmod(k, F.lit(10)))
        .groupBy("k_mod")
        .agg(F.count("*").alias("n"))
    )
