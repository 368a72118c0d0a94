"""Custom stateful streaming operators via applyInPandasWithState.

Reference: modules/dbparser/correlation-context.c + timerwheel.c — a
correlation context accumulates messages per key and emits ONE
synthetic message when the context times out (no message for `timeout`
seconds). `session_window` covers the aggregate case
(streaming/grouping_by.py); this module is the general hook for logic
session windows can't express: per-context custom accumulators,
trigger() conditions that close a context early, and token-bucket rate
limiting with exact per-message admission.

State is keyed and partitioned like any shuffle → scales horizontally;
event-time timeouts ride the watermark exactly like the reference's
timer wheel rides its clock.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def grouping_by_stateful(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value_col: str = "value",
    timeout: int = 1800,
    watermark: str = "10 minutes",
    trigger_count: int | None = None,
) -> DataFrame:
    """grouping-by() with explicit context state: emits one synthetic
    row per closed context (timeout-driven, like pdb-context expiry),
    or immediately when `trigger_count` messages accumulate (the
    trigger() condition, groupingby.c:_evaluate_trigger).
    """
    out_schema = (
        f"{key} long, context_length long, time_first timestamp, "
        "time_last timestamp, sum_value double, closed_by string"
    )
    state_schema = "n long, tf long, tl long, sv double"

    def fn(
        key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key_tuple

        def emit(n, tf, tl, sv, how):
            return pd.DataFrame(
                {
                    key: [k],
                    "context_length": [n],
                    "time_first": [pd.Timestamp(tf, unit="us")],
                    "time_last": [pd.Timestamp(tl, unit="us")],
                    "sum_value": [sv],
                    "closed_by": [how],
                }
            )

        if state.hasTimedOut:
            n, tf, tl, sv = state.get
            state.remove()
            yield emit(n, tf, tl, sv, "timeout")
            return

        n, tf, tl, sv = state.get if state.exists else (0, None, None, 0.0)
        for pdf in pdfs:
            if pdf.empty:
                continue
            us = pdf[ts].astype("int64") // 1000  # ns → µs
            n += len(pdf)
            tf = int(us.min()) if tf is None else min(tf, int(us.min()))
            tl = int(us.max()) if tl is None else max(tl, int(us.max()))
            sv += float(pdf[value_col].sum())
        if trigger_count is not None and n >= trigger_count:
            state.remove()
            yield emit(n, tf, tl, sv, "trigger")
            return
        state.update((n, tf, tl, sv))
        # context expires `timeout` seconds of *event time* after the
        # last message — the reference's timer-wheel reschedule. Clamped
        # above the current watermark: a timeout shorter than the
        # watermark delay would otherwise compute a timestamp <= the
        # watermark, which Spark rejects (IllegalArgumentException)
        # and kills the whole streaming query.
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(tl // 1000 + timeout * 1000, wm_ms + 1))

    return (
        events.withWatermark(ts, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def token_bucket_rate_limit(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    rate_per_sec: float = 1.0,
    burst: int = 10,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact per-message rate-limit() (reference: throttle option /
    rate-limit filter): a token bucket per key refilled in event time.
    Emits per-key accounting rows per micro-batch."""
    out_schema = f"{key} long, batch_passed long, batch_dropped long"
    state_schema = "tokens double, last_us long"

    def fn(
        key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key_tuple
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        tokens, last_us = state.get if state.exists else (float(burst), 0)
        passed = dropped = 0
        rows = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            us = (pdf[ts].astype("int64") // 1000).tolist()
            rows.extend(us)
        for t_us in sorted(rows):
            if last_us:
                tokens = min(float(burst), tokens + (t_us - last_us) / 1e6 * rate_per_sec)
            last_us = t_us
            if tokens >= 1.0:
                tokens -= 1.0
                passed += 1
            else:
                dropped += 1
        state.update((tokens, last_us))
        yield pd.DataFrame({key: [k], "batch_passed": [passed], "batch_dropped": [dropped]})

    return (
        events.withWatermark(ts, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
