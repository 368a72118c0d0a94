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


def context_emit_stream(
    events: DataFrame,
    key: Sequence[str],
    carry: Sequence[str],
    ts: str = "ts",
    timeout: int = 60,
    watermark: str = "10 minutes",
    trigger_count: int | None = None,
) -> DataFrame:
    """Correlation-context emitter: one row per CLOSED context
    (event-time timeout, or `trigger_count` messages), carrying the
    context's LAST message's `carry` columns plus context_length /
    time_first / time_last — the streaming analog of patterndb context
    expiry (modules/dbparser/patterndb.c pattern_db_expire_entry,
    timerwheel.c). Downstream selects render synthetic messages from
    these rows with the template compiler, so rendering stays JVM-side
    Column logic; only the context bookkeeping lives in Python state.
    """
    dtypes = dict(events.dtypes)
    key = list(key)
    carry = [c for c in carry if c not in key]

    out_schema = ", ".join(
        [f"`{c}` {dtypes[c]}" for c in key]
        + [f"`{c}` {dtypes[c]}" for c in carry]
        + ["context_length long", "time_first timestamp", "time_last timestamp",
           "closed_by string"]
    )
    state_fields = ["n long", "tf long", "tl long"]
    for c in carry:
        state_fields.append(f"`_c_{c}` " + ("long" if dtypes[c] == "timestamp" else dtypes[c]))
    state_schema = ", ".join(state_fields)

    def _to_state(val, dt):
        if val is None or (isinstance(val, float) and pd.isna(val)):
            return None
        if dt == "timestamp":
            return int(pd.Timestamp(val).value // 1000)  # ns → µs
        if hasattr(val, "item"):
            return val.item()
        return val

    def _from_state(val, dt):
        if val is None:
            return None
        if dt == "timestamp":
            return pd.Timestamp(val, unit="us")
        return val

    def fn(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        def emit(n, tf, tl, carried, how):
            row = {c: [v] for c, v in zip(key, key_tuple)}
            for c, v in zip(carry, carried):
                row[c] = [_from_state(v, dtypes[c])]
            row["context_length"] = [n]
            row["time_first"] = [pd.Timestamp(tf, unit="us")]
            row["time_last"] = [pd.Timestamp(tl, unit="us")]
            row["closed_by"] = [how]
            return pd.DataFrame(row)

        if state.hasTimedOut:
            packed = state.get
            n, tf, tl = packed[0], packed[1], packed[2]
            state.remove()
            yield emit(n, tf, tl, packed[3:], "timeout")
            return

        if state.exists:
            packed = state.get
            n, tf, tl, carried = packed[0], packed[1], packed[2], list(packed[3:])
        else:
            n, tf, tl, carried = 0, None, None, [None] * len(carry)
        for pdf in pdfs:
            if pdf.empty:
                continue
            us = pdf[ts].astype("int64") // 1000
            n += len(pdf)
            tf = int(us.min()) if tf is None else min(tf, int(us.min()))
            batch_last = pdf.loc[us.idxmax()]
            if tl is None or int(us.max()) >= tl:
                tl = int(us.max())
                carried = [_to_state(batch_last[c], dtypes[c]) for c in carry]
        if trigger_count is not None and n >= trigger_count:
            state.remove()
            yield emit(n, tf, tl, carried, "trigger")
            return
        state.update((n, tf, tl, *carried))
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(tl // 1000 + timeout * 1000, wm_ms + 1))

    return (
        events.withWatermark(ts, watermark)
        .groupBy(*key)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def patterndb_actions_stream(
    events: DataFrame,
    rules,
    msg_col: str = "message",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming patterndb <actions>: match-trigger actions are a
    stateless filter + template projection on the live stream;
    timeout-trigger actions ride `context_emit_stream` (the correlation
    context state) and render from the emitted context row — the
    streaming counterpart of operators/actions.patterndb_actions
    (reference trigger plumbing: modules/dbparser/patterndb.c:257-400).

    Scope note: $(context-length) inside *match*-trigger templates
    renders as '1' here (per-message context position needs the
    context state; the timeout path provides the real count)."""
    from pyspark.sql import functions as F

    from syslog_ng_spark.operators.actions import (
        _MACRO_COLS,
        _render,
        _scope_cols,
        compile_condition,
    )
    from syslog_ng_spark.operators.patterndb import compile_pattern
    from syslog_ng_spark.template import TemplateCompiler, schema_resolver

    compiled = {r.rule_id: [compile_pattern(p) for p in r.patterns] for r in rules}
    cls_expr = None
    for r in rules:
        cond = None
        for rx, _ in compiled[r.rule_id]:
            c = F.col(msg_col).rlike(rx)
            cond = c if cond is None else (cond | c)
        if cond is None:
            continue
        cls_expr = (
            F.when(cond, F.lit(r.rule_id))
            if cls_expr is None
            else cls_expr.when(cond, F.lit(r.rule_id))
        )
    tagged = events.withColumn("_rule", cls_expr.otherwise(F.lit("")))

    extra_values = []
    for r in rules:
        for a in r.actions:
            for name in a.message.values:
                target = _MACRO_COLS.get(name, name)
                if target not in events.columns and target not in extra_values:
                    extra_values.append(target)
    out_columns = list(events.columns) + extra_values

    outs = []
    for r in rules:
        matched = tagged.where(F.col("_rule") == r.rule_id)
        for rx, fs in compiled[r.rule_id]:
            for name in fs:
                if name in matched.columns:
                    continue
                matched = matched.withColumn(
                    name,
                    F.when(
                        F.col(msg_col).rlike(rx),
                        F.regexp_extract(F.col(msg_col), rx, fs.index(name) + 1),
                    ).otherwise(F.lit("")),
                )
        scope = _scope_cols(r.context_scope, events)
        if r.context_id is not None:
            ctx_id = TemplateCompiler(schema_resolver(matched.columns)).compile(r.context_id)
            matched = matched.withColumn("CONTEXT_ID", ctx_id)
            ctx_key = scope + ["CONTEXT_ID"]
        else:
            ctx_key = scope

        for a in r.actions:
            if a.trigger == "match":
                cand = matched.withColumn("CONTEXT_LENGTH", F.lit("1"))
                if a.condition:
                    cand = cand.where(compile_condition(a.condition, cand))
                rendered = _render(
                    cand, a, out_columns, extra_values, a.message.inherit != "none", ts_col
                )
            elif a.trigger == "timeout":
                if r.context_id is None:
                    continue
                carry = [c for c in matched.columns if c != "_rule"]
                ctx = context_emit_stream(
                    matched, ctx_key, carry, ts=ts_col, timeout=r.context_timeout,
                    watermark=watermark,
                ).withColumn("CONTEXT_LENGTH", F.col("context_length").cast("string"))
                if a.condition:
                    ctx = ctx.where(compile_condition(a.condition, ctx))
                rendered = _render(
                    ctx, a, out_columns, extra_values, a.message.inherit != "none", ts_col
                )
            else:
                raise ValueError(f"unknown trigger {a.trigger!r}")
            outs.append(
                rendered.withColumn("rule_id", F.lit(r.rule_id)).withColumn(
                    "trigger", F.lit(a.trigger)
                )
            )

    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
