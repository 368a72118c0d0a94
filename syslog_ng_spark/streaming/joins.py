"""Stream-stream correlation join.

Reference analog: syslog-ng correlates messages from two independent
paths by routing both into one db-parser correlation context keyed by
a shared field (modules/dbparser/correlation-context.c) — e.g. a
firewall DENY joined to the IDS alert for the same flow id arriving
seconds apart on another socket.

Structured Streaming expresses exactly this as a watermarked
stream-stream inner/outer join with a time-interval predicate: each
side buffers only rows newer than its watermark, the join key hashes
both streams to the same task, and state is evicted the moment the
interval condition can no longer match — bounded memory at any input
rate, which is the property the reference gets from context timeouts
(correlation.c's timer wheel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "5 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join two streams on `on` where the right event lands within
    [left_ts, left_ts + within]. Both sides get watermarks (state
    eviction bound); non-key columns are prefixed so the two payloads
    stay distinguishable. `how` may be inner / leftOuter / rightOuter /
    fullOuter (outer rows emit once the watermark proves no match can
    arrive — the streaming analog of a context timing out empty)."""
    lt, rt = left_prefix + left_ts, right_prefix + right_ts

    def tag(df: DataFrame, prefix: str, ts_col: str, keep_key: bool) -> DataFrame:
        out = df
        for c in df.columns:
            if c != on or not keep_key:
                out = out.withColumnRenamed(c, prefix + c)
        return out.withWatermark(prefix + ts_col, watermark)

    l = tag(left, left_prefix, left_ts, keep_key=True)
    r = tag(right, right_prefix, right_ts, keep_key=False)
    cond = (
        (F.col(on) == F.col(right_prefix + on))
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {within}"))
    )
    joined = l.join(r, cond, how)
    # outer modes: an unmatched RIGHT row carries its key only in the
    # prefixed copy — coalesce so `on` is always populated
    return joined.withColumn(
        on, F.coalesce(F.col(on), F.col(right_prefix + on))
    ).drop(right_prefix + on)
