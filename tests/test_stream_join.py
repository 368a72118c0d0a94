"""stream_stream_join: watermarked two-stream correlation
(streaming/joins.py). Inner matches within the interval; leftOuter
emits the unmatched left row once the watermark proves no partner can
arrive (reference analog: a correlation context timing out empty)."""

from __future__ import annotations

import datetime
import tempfile

from syslog_ng_spark.streaming.joins import stream_stream_join

BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "flow string, ts timestamp, msg string"


def _run(spark, d, how, left_rows, right_rows, pushers):
    def write(rows, sub):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
            d + "/" + sub
        )

    def run_once():
        lstream = spark.readStream.schema(SCHEMA).parquet(d + "/l")
        rstream = spark.readStream.schema(SCHEMA).parquet(d + "/r")
        joined = stream_stream_join(
            lstream,
            rstream,
            on="flow",
            within="5 minutes",
            watermark="10 minutes",
            how=how,
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", d + "/out")
            .option("checkpointLocation", d + "/ck")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    write(left_rows, "l")
    write(right_rows, "r")
    run_once()
    # far-future rows on BOTH sides advance both watermarks so outer
    # results for phase-1 rows are finalized
    write(pushers, "l")
    write(pushers, "r")
    run_once()
    return spark.read.parquet(d + "/out").collect()


def test_inner_join_within_interval(spark):
    left = [
        ("f1", BASE, "deny"),
        ("f2", BASE, "deny"),  # partner arrives too late (7 min)
        ("f3", BASE, "deny"),  # no partner at all
    ]
    right = [
        ("f1", BASE + datetime.timedelta(minutes=2), "alert"),
        ("f2", BASE + datetime.timedelta(minutes=7), "alert"),
    ]
    pushers = [("zz", BASE + datetime.timedelta(days=2), "tick")]
    with tempfile.TemporaryDirectory() as d:
        rows = _run(spark, d, "inner", left, right, pushers)
    got = {(r["flow"], r["l_msg"], r["r_msg"]) for r in rows}
    assert ("f1", "deny", "alert") in got
    assert not any(r["flow"] == "f2" for r in rows)
    assert not any(r["flow"] == "f3" for r in rows)


def test_left_outer_emits_timeouts(spark):
    left = [
        ("f1", BASE, "deny"),
        ("f3", BASE, "deny"),  # should emit with null right side
    ]
    right = [("f1", BASE + datetime.timedelta(minutes=1), "alert")]
    pushers = [("zz", BASE + datetime.timedelta(days=2), "tick")]
    with tempfile.TemporaryDirectory() as d:
        rows = _run(spark, d, "leftOuter", left, right, pushers)
    by_flow = {r["flow"]: r for r in rows if r["flow"] != "zz"}
    assert by_flow["f1"]["r_msg"] == "alert"
    assert by_flow["f3"]["r_msg"] is None  # timed out unmatched
