"""Temporal join operators: as-of join (point-in-time enrichment).

The reference has no as-of join (its correlation engine —
modules/dbparser/correlation-context.c — holds a bounded in-memory
context per key and resolves "most recent state" imperatively as
messages arrive). At 100 TB the same need — attach the most recent
dimension/state row at-or-before each event's timestamp — is a
first-class batch operator for training-data pipelines (point-in-time
feature joins that must not leak future data).

Spark has no ASOF JOIN builtin. The naive encoding
(`JOIN ON key = key AND r.ts <= l.ts` + row_number) is a range join:
Catalyst plans a per-key cross product, O(n_l * n_r) per key. This
implementation is the union-window algorithm instead:

  1. tag left rows side=1, right rows side=0,
  2. union on (key, ts) with the right payload packed in ONE struct
     column (null for left rows),
  3. one window per key ordered by (ts, side, tie) taking
     last(payload, ignorenulls=True) — each left row sees the latest
     right payload at-or-before it,
  4. keep side=1 rows and unpack the struct.

Cost: ONE hash shuffle of |L|+|R| rows on the key (identical to the
equi-join the user would have paid anyway) + a per-key sort — no
range-join explosion, no broadcast requirement on either side. Skew
bound: a window partition is one key's rows; per-key cardinality is
the same bound the correlation engine itself assumes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"
_TIE = "__asof_tie"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_on: str | None = None,
    tolerance: Column | None = None,
    tie_break: str | None = None,
    suffix: str = "",
) -> DataFrame:
    """For every left row, append the right row with the greatest
    `right_ts` <= `left_ts` within the same `on` key (backward
    inclusive match, pandas.merge_asof semantics). Unmatched left rows
    null-extend.

    tolerance  optional Column interval (e.g. F.expr("INTERVAL 90 DAYS")):
               matches older than `left_ts - tolerance` are discarded
               (nulled), mirroring merge_asof(tolerance=...).
    tie_break  right column deciding ties when several right rows share
               one (key, ts): the row with the GREATEST tie_break wins,
               making the result deterministic. Without it ties resolve
               arbitrarily (same as the reference's last-write-wins
               context update, which depends on arrival order).
    suffix     appended to right payload column names that collide with
               left column names.
    """
    rkey = right_on or on
    r = right.withColumnRenamed(rkey, on) if rkey != on else right
    payload_cols = [c for c in r.columns if c != on]

    out_names = {}
    for c in payload_cols:
        out_names[c] = c + suffix if (c in left.columns and c != on) else c

    # Right rows sort BEFORE left rows at an equal timestamp (side 0 < 1)
    # so an exactly-simultaneous right row is visible to the left row —
    # "at or before". tie_break ascends so the greatest lands last and
    # wins last(ignorenulls).
    r_tagged = r.select(
        F.col(on),
        F.col(right_ts).cast("timestamp").alias("__asof_ts"),
        F.lit(0).alias(_SIDE),
        (F.col(tie_break).cast("double") if tie_break else F.lit(0.0)).alias(_TIE),
        F.struct(
            F.col(right_ts).cast("timestamp").alias("__matched_ts"),
            *[F.col(c).alias(out_names[c]) for c in payload_cols],
        ).alias(_PAYLOAD),
    )

    l_tagged = left.select(
        "*",
        F.col(left_ts).cast("timestamp").alias("__asof_ts"),
        F.lit(1).alias(_SIDE),
        F.lit(0.0).alias(_TIE),
        F.lit(None).cast(r_tagged.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )

    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("__asof_ts", _SIDE, _TIE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
        .where(F.col(_SIDE) == 1)
    )
    if tolerance is not None:
        matched = matched.withColumn(
            _PAYLOAD,
            F.when(
                F.col(f"{_PAYLOAD}.__matched_ts")
                >= F.col("__asof_ts").cast("timestamp") - tolerance,
                F.col(_PAYLOAD),
            ),
        )
    out = matched.select(
        *[F.col(c) for c in left.columns],
        *[
            F.col(f"{_PAYLOAD}.{out_names[c]}").alias(out_names[c])
            for c in payload_cols
        ],
    )
    return out
