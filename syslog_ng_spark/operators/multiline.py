"""Multi-line message reassembly (stack traces, indented continuations).

Reference: lib/logproto/logproto-indented-multiline-server.c (a line
starting with whitespace continues the previous message),
logproto-regexp-multiline-server.c (prefix regex marks the FIRST line
of a message; optional garbage/suffix regex marks the end; tests in
lib/logproto/tests/test-indented-multiline-server.c and
test-regexp-multiline.c). The reference reassembles inside the
transport read loop; the Spark-first batch form is the sessionize
idiom — a start-of-message flag, a running sum over a window to get
message ids, one groupBy to join the lines — and the streaming form is
the same flag logic with the open tail held in keyed state.

Scale note: reassembly is inherently ordered WITHIN a file, so the
window partitions by the file/group column — parallelism comes from
the number of files, which is how the reference scales too (one
reader per file). No global ordering is ever required.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _start_flag(line: Column, mode: str, prefix: str | None) -> Column:
    if mode == "indented":
        # continuation := leading space/tab (logproto-indented-…:l. read loop)
        return ~line.rlike(r"^[ \t]")
    if mode == "prefix":
        if not prefix:
            raise ValueError("prefix mode needs a prefix regex")
        return line.rlike(prefix)
    raise ValueError(f"unknown multiline mode: {mode}")


def reassemble_multiline(
    df: DataFrame,
    line_col: str = "raw",
    order_col: str = "line_no",
    group_col: str | None = None,
    mode: str = "indented",
    prefix: str | None = None,
    suffix: str | None = None,
    joiner: str = "\n",
) -> DataFrame:
    """Batch reassembly: returns one row per logical message with
    columns (group?, msg_id, message, n_lines, first_<order_col>).

    A line whose start-flag is true begins a new message; with
    `suffix` (prefix-suffix mode), a line matching it ENDS the current
    message (the next line starts a new one regardless of prefix).
    msg_id is the running count of message starts per group — the
    same cumulative-sum sessionize as grouping-by, one window + one
    shuffle."""
    from pyspark.sql import Window

    line = F.col(line_col)
    start = _start_flag(line, mode, prefix)
    if suffix:
        w_prev = (
            Window.partitionBy(*( [group_col] if group_col else [] ))
            .orderBy(order_col)
        )
        ended_before = F.lag(line.rlike(suffix), 1, False).over(w_prev)
        start = start | ended_before
    keys = [group_col] if group_col else []
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = df.withColumn("_msg_id", F.sum(start.cast("long")).over(w))
    grouped = flagged.groupBy(*keys, "_msg_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(order_col).alias("o"), line.alias("l")))
                ),
                lambda s: s["l"],
            ),
            joiner,
        ).alias("message"),
        F.count(F.lit(1)).alias("n_lines"),
        F.min(order_col).alias(f"first_{order_col}"),
    )
    return grouped.withColumnRenamed("_msg_id", "msg_id")


def reassemble_multiline_stream(
    lines: DataFrame,
    group_col: str = "path",
    order_col: str = "line_no",
    line_col: str = "raw",
    mode: str = "indented",
    prefix: str | None = None,
    joiner: str = "\n",
    flush_timeout_s: int | None = None,
) -> DataFrame:
    """Streaming reassembly via keyed state: the open (unterminated)
    message tail is held per group across micro-batches and emitted
    when the next message start arrives — exactly the reference's
    read-loop behavior, where a partial message waits for its
    continuation. `flush_timeout_s` is the reference's
    flush-timeout(): with no new lines for that long (processing
    time), the pending tail is emitted and the key's state dropped.

    State is one partial message per file — bounded by the number of
    live files, not by throughput."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{group_col} string, first_{order_col} long, message string, n_lines long"
    )
    state_schema = "pending string, pending_n long, first_o long"

    import re as _re

    if mode == "prefix":
        if not prefix:
            raise ValueError("prefix mode needs a prefix regex")
        rx = _re.compile(prefix)
        is_start = lambda s: rx.search(s) is not None  # noqa: E731
    elif mode == "indented":
        is_start = lambda s: not s.startswith((" ", "\t"))  # noqa: E731
    else:
        raise ValueError(f"unknown multiline mode: {mode}")

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (grp,) = key
        if state.hasTimedOut:
            pending, pending_n, first_o = state.get
            state.remove()
            if pending_n:
                yield pd.DataFrame(
                    {
                        group_col: [grp],
                        f"first_{order_col}": [first_o],
                        "message": [pending],
                        "n_lines": [pending_n],
                    }
                )
            return
        pending, pending_n, first_o = (
            state.get if state.exists else ("", 0, 0)
        )
        rows = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            rows.extend(
                pdf[[order_col, line_col]].itertuples(index=False, name=None)
            )
        out = []
        for o, line in sorted(rows):
            if is_start(line) and pending_n:
                out.append((grp, first_o, pending, pending_n))
                pending, pending_n = "", 0
            if pending_n == 0:
                first_o = o
                pending, pending_n = line, 1
            else:
                pending, pending_n = pending + joiner + line, pending_n + 1
        state.update((pending, pending_n, first_o))
        if flush_timeout_s is not None:
            state.setTimeoutDuration(flush_timeout_s * 1000)
        if out:
            yield pd.DataFrame(
                out, columns=[group_col, f"first_{order_col}", "message", "n_lines"]
            )

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if flush_timeout_s is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        lines.groupBy(group_col)
        .applyInPandasWithState(fn, out_schema, state_schema, "append", timeout_conf)
    )
