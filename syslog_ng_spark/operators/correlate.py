"""Stateful correlation — grouping-by() re-expressed for Spark.

Reference: modules/dbparser/groupingby.c — groups messages by a key
template into a correlation context that closes after `timeout()`
seconds of inactivity, then emits one synthetic message aggregated
over the context (count/sum/avg via $(context-*) functions,
lib's context-funcs.c), optionally gated by having().

Batch semantics: a context == a *session* — a maximal run of events
per key where consecutive gaps <= timeout. We derive session ids with
window functions (lag + running sum of boundary flags). This is one
shuffle on the key, all JVM-side; at 100 TB the shuffle is keyed by
the correlation key so it parallelizes across executors, and skewed
keys are split by AQE skew-join/partial agg.

Streaming semantics: see syslog_ng_spark/streaming/grouping_by.py
(session_window + watermark — Spark's native analog of the reference
timer wheel, modules/dbparser/timerwheel.c).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..util import epoch_seconds


def sessionize(
    df: DataFrame,
    key: Sequence[str],
    ts: str = "ts",
    timeout: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign a `session_id` (0-based per key) using gap > timeout as the
    context boundary. Deterministic ordering: (ts, tiebreak)."""
    order = [F.col(ts)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(*key).orderBy(*order)
    prev_ts = F.lag(F.col(ts)).over(w)
    gap = epoch_seconds(F.col(ts)) - epoch_seconds(prev_ts)
    is_new = F.when(prev_ts.isNull() | (gap > timeout), F.lit(1)).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )


def grouping_by(
    df: DataFrame,
    key: Sequence[str],
    aggregates: dict[str, Column],
    ts: str = "ts",
    timeout: int = 1800,
    having: Column | None = None,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """grouping-by(key(...) timeout(...) aggregate(...) having(...)).

    `aggregates` maps output column name → agg expression; time_first /
    time_last / context_length are always emitted (the reference's
    $(context-length), ${TIME_FIRST}/${TIME_LAST} macros,
    lib/template/macros.c M_TIME_FIRST)."""
    sessions = sessionize(df, key, ts=ts, timeout=timeout, order_tiebreak=order_tiebreak)
    aggs = [
        F.count(F.lit(1)).alias("context_length"),
        F.min(ts).alias("time_first"),
        F.max(ts).alias("time_last"),
    ] + [expr.alias(name) for name, expr in aggregates.items()]
    out = sessions.groupBy(*key, "session_id").agg(*aggs)
    if having is not None:
        out = out.filter(having)
    return out


def suppress(
    df: DataFrame,
    key: Sequence[str],
    ts: str = "ts",
    seconds: int = 30,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """suppress() — collapse repeated identical messages.

    Reference: lib/logwriter.c suppress option ("last message repeated
    n times"): an identical message (same key columns, typically
    host+message) arriving within `seconds` of the previously EMITTED
    one is swallowed; the run's first occurrence is emitted with the
    swallowed count. A run ends when the gap since the last occurrence
    exceeds `seconds` — i.e. the reference's suppress timer expiring —
    so this is sessionize() with the suppress window as the timeout:
    one shuffle on the message key, all JVM-side.

    Returns one row per emitted message: the key columns, first/last
    ts, and n_suppressed (the 'repeated n times' counter)."""
    sess = sessionize(df, key, ts, timeout=seconds, order_tiebreak=order_tiebreak)
    return sess.groupBy(*key, "session_id").agg(
        F.min(ts).alias("first_ts"),
        F.max(ts).alias("last_ts"),
        (F.count(F.lit(1)) - 1).alias("n_suppressed"),
    )


def writer_suppress(
    df: DataFrame,
    seconds: int = 30,
    ts: str = "ts",
    order_tiebreak: str | None = None,
    local_hostname: str | None = None,
) -> DataFrame:
    """Destination-writer suppress() (lib/logwriter.c
    log_writer_is_msg_suppressed): a repetition — same MESSAGE, HOST,
    PROGRAM and PID (_is_message_a_repetition, logwriter.c:662-668) —
    arriving within `seconds` of the run's previous occurrence is
    swallowed; the run's FIRST message is delivered, and the run's
    end emits the internal summary message
    ``Last message '<first 20 chars>' repeated N times, suppressed by
    syslog-ng on <local fqdn>`` carrying the suppressed message's
    pri/host/program (log_writer_emit_suppress_summary,
    logwriter.c:602-628); '-- MARK --' lines are never suppressed
    (logwriter.c:654-659). The summary is stamped at the run's
    suppress-timer expiry (last occurrence + seconds); its pid is
    unset (the reference stamps the daemon's own pid on the internal
    message).

    Model note: the reference writer tracks only THE last message, so
    a DIFFERENT message interleaving on the same writer ends a run
    early; a single-writer total order has no scalable analog, so
    runs here are per (message,host,program,pid) KEY — one shuffle,
    parallel across keys. Output is identical whenever distinct
    messages don't interleave inside the suppress window, and strictly
    fewer rows otherwise (the keyed run keeps suppressing where the
    reference would restart).

    Plan shape (r15): one window pipeline, filtered ONCE — a run's
    first row (row_number == 1) is emitted as the delivered message
    and its last row (row_number == count, count > 1) as the expiry
    summary, chosen per row by a conditional projection. The previous
    shape filtered the same ranked frame twice (firsts / summary
    branches), and since nothing was cached Catalyst re-executed the
    whole scan+sessionize+window pipeline per branch (3 parquet
    scans, 10 exchanges, 9 windows → 2 scans, 3 exchanges, 4
    windows); at 100 TB that was two extra full shuffles of the
    corpus plus an extra scan for identical rows."""
    import socket as _socket

    if local_hostname is None:
        local_hostname = _socket.getfqdn()
    key = [c for c in ("message", "host", "program", "pid") if c in df.columns]
    mark = F.col("message") == "-- MARK --"
    marks = df.where(mark)
    sess = sessionize(df.where(~mark), key, ts, timeout=seconds,
                      order_tiebreak=order_tiebreak)
    w = Window.partitionBy(*key, "session_id").orderBy(
        F.col(ts), *( [F.col(order_tiebreak)] if order_tiebreak else [] ))
    ranked = sess.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(
            Window.partitionBy(*key, "session_id")))
    is_first = F.col("_rn") == 1
    kept = ranked.where(is_first | ((F.col("_rn") == F.col("_n"))
                                    & (F.col("_n") > 1)))
    summary_msg = F.format_string(
        "Last message '%s' repeated %d times, suppressed by "
        "syslog-ng on %s",
        F.substring(F.col("message"), 1, 20),
        (F.col("_n") - 1).cast("int"),
        F.lit(local_hostname))
    pid_t = dict(df.dtypes).get("pid", "int")
    cols = []
    for c in df.columns:
        if c == "message":
            cols.append(F.when(is_first, F.col(c)).otherwise(summary_msg).alias(c))
        elif c == "pid":
            cols.append(F.when(is_first, F.col(c))
                        .otherwise(F.lit(None).cast(pid_t)).alias(c))
        elif c == ts:
            # the summary is stamped at the run's suppress-timer
            # expiry: the last occurrence (this row) + seconds
            cols.append(F.when(is_first, F.col(c)).otherwise(
                F.col(c) + F.make_dt_interval(secs=F.lit(seconds))).alias(c))
        else:
            cols.append(F.col(c).alias(c))
    return kept.select(*cols).unionByName(marks)


def suppress_stream(
    events: DataFrame,
    key: Sequence[str],
    ts: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming suppress: exact duplicates (same key columns) within
    the watermark horizon are dropped, state expires automatically —
    Spark's dropDuplicatesWithinWatermark is precisely the reference's
    suppress timer with the watermark as the timer wheel."""
    return events.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(list(key))
