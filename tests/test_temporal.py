"""asof_join: backward-inclusive point-in-time join, union-window
implementation (operators/temporal.py). Semantics mirror
pandas.merge_asof(direction='backward'); plan shape must stay a single
hash shuffle + window — no range join."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from syslog_ng_spark.operators.temporal import asof_join


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", ts("2024-01-01 10:00:00")),
            (2, "k1", ts("2024-01-01 12:00:00")),
            (3, "k1", ts("2024-01-01 09:00:00")),  # before any right row
            (4, "k2", ts("2024-01-01 12:00:00")),  # exact-equal ts match
            (5, "k3", ts("2024-01-01 12:00:00")),  # key with no right rows
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", ts("2024-01-01 09:30:00"), 10, "a"),
            ("k1", ts("2024-01-01 11:00:00"), 11, "b"),
            ("k1", ts("2024-01-01 13:00:00"), 12, "c"),
            ("k2", ts("2024-01-01 12:00:00"), 20, "x"),
            ("k2", ts("2024-01-01 12:00:00"), 21, "y"),  # tie on ts
        ],
        "k string, rts timestamp, rid long, val string",
    )
    return left, right


def test_backward_inclusive_and_nulls(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts", tie_break="rid"
    )
    rows = {r["id"]: (r["rid"], r["val"]) for r in out.collect()}
    assert rows[1] == (10, "a")  # latest at-or-before 10:00 is 09:30
    assert rows[2] == (11, "b")  # 11:00, not future 13:00
    assert rows[3] == (None, None)  # nothing before 09:00
    assert rows[4] == (21, "y")  # equal ts matches; tie -> greatest rid
    assert rows[5] == (None, None)  # key absent from right
    assert out.count() == left.count()  # never duplicates left rows


def test_tolerance_discards_stale_matches(spark):
    left, right = _frames(spark)
    out = asof_join(
        left,
        right,
        on="k",
        left_ts="ts",
        right_ts="rts",
        tie_break="rid",
        tolerance=F.expr("INTERVAL 30 MINUTES"),
    )
    rows = {r["id"]: r["rid"] for r in out.collect()}
    assert rows[1] == 10  # 09:30 within 30min of 10:00
    assert rows[2] is None  # 11:00 is 60min before 12:00 -> stale
    assert rows[4] == 21  # 0-age match survives any tolerance


def test_right_key_rename_and_suffix(spark):
    left = spark.createDataFrame(
        [(1, 7, ts("2024-01-01 10:00:00"), "L")],
        "id long, user long, ts timestamp, val string",
    )
    right = spark.createDataFrame(
        [(7, ts("2024-01-01 09:00:00"), "R")],
        "uid long, ts timestamp, val string",
    )
    out = asof_join(
        left,
        right,
        on="user",
        right_on="uid",
        left_ts="ts",
        right_ts="ts",
        suffix="_r",
    )
    row = out.collect()[0]
    assert row["val"] == "L" and row["val_r"] == "R"


def test_plan_has_no_range_join(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"):
        assert bad not in plan, f"asof_join planned a {bad}:\n{plan[:2000]}"
    assert "Window" in plan
