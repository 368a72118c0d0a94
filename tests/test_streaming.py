from __future__ import annotations

import datetime
import tempfile

from pyspark.sql import functions as F

from syslog_ng_spark.streaming.grouping_by import grouping_by_stream, rate_limit

BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _run_two_phase(spark, d, build_query, phase1_rows, phase2_rows, name):
    """Append-mode aggregations only emit once the watermark passes a
    window end, and the watermark only advances between micro-batches —
    so run two availableNow passes over a shared checkpoint: phase 2's
    far-future rows push the watermark past phase 1's windows."""
    schema = "user_id int, ts timestamp, value double"

    def write(rows, sub):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(d + "/in")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(d + "/in")
        q = (
            build_query(stream)
            .writeStream.format("parquet")
            .option("path", d + "/out")
            .option("checkpointLocation", d + "/ck")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write(phase1_rows, "a")
    run_once()
    write(phase2_rows, "b")
    run_once()
    return spark.read.parquet(d + "/out").collect()


def test_grouping_by_stream_session_windows(spark):
    phase1 = [
        (1, BASE, 1.0),
        (1, BASE + datetime.timedelta(minutes=5), 2.0),
        (2, BASE, 4.0),
    ]
    phase2 = [(99, BASE + datetime.timedelta(days=1), 0.0)]  # watermark pusher
    with tempfile.TemporaryDirectory() as d:
        rows = _run_two_phase(
            spark,
            d,
            lambda s: grouping_by_stream(
                s,
                key=["user_id"],
                aggregates={"sum_value": F.sum("value")},
                timeout="30 minutes",
                watermark="10 minutes",
            ),
            phase1,
            phase2,
            "gb_sessions",
        )
    by = {(r.user_id, r.context_length) for r in rows}
    assert (1, 2) in by  # user 1's 2-event session closed and emitted
    assert (2, 1) in by
    sums = {r.user_id: r.sum_value for r in rows}
    assert sums[1] == 3.0


def test_rate_limit_accounting(spark):
    phase1 = [(1, BASE + datetime.timedelta(seconds=i), 1.0) for i in range(10)]
    phase2 = [(99, BASE + datetime.timedelta(days=1), 0.0)]
    with tempfile.TemporaryDirectory() as d:
        rows = _run_two_phase(
            spark,
            d,
            lambda s: rate_limit(s, key=["user_id"], max_per_window=3, window="1 minute"),
            phase1,
            phase2,
            "rl",
        )
    got = {r.user_id: (r.passed, r.dropped) for r in rows}
    assert got[1] == (3, 7)


def test_suppress_stream_drops_duplicates(spark):
    import datetime as dt
    import tempfile

    from syslog_ng_spark.operators.correlate import suppress_stream

    base = dt.datetime(2024, 1, 1)
    schema = "host string, message string, ts timestamp"
    rows = [
        ("h1", "disk full", base),
        ("h1", "disk full", base + dt.timedelta(seconds=10)),  # dropped
        ("h1", "other", base + dt.timedelta(seconds=20)),
        ("h2", "disk full", base + dt.timedelta(seconds=30)),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d + "/in")
        q = (
            suppress_stream(
                spark.readStream.schema(schema).parquet(d + "/in"),
                ["host", "message"],
                watermark="5 minutes",
            )
            .writeStream.format("parquet")
            .option("path", d + "/out")
            .option("checkpointLocation", d + "/ck")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.read.parquet(d + "/out").collect()
    assert len(out) == 3
    assert sorted((r.host, r.message) for r in out) == [
        ("h1", "disk full"), ("h1", "other"), ("h2", "disk full"),
    ]


def test_dedup_exact_stream_fingerprint_dedup(spark):
    import datetime as dt
    import tempfile

    from syslog_ng_spark.operators.dedup import dedup_exact_stream

    base = dt.datetime(2024, 1, 1)
    schema = "doc_id long, text string, ts timestamp"
    rows = [
        (1, "The Quick  brown fox", base),
        (2, "the quick brown fox", base + dt.timedelta(seconds=5)),   # dup of 1 modulo case/ws
        (3, "something else entirely", base + dt.timedelta(seconds=10)),
        (4, "the quick brown fox", base + dt.timedelta(seconds=15)),  # dup again
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d + "/in")
        q = (
            dedup_exact_stream(
                spark.readStream.schema(schema).parquet(d + "/in"),
                watermark="5 minutes",
            )
            .writeStream.format("parquet")
            .option("path", d + "/out")
            .option("checkpointLocation", d + "/ck")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.read.parquet(d + "/out").collect()
    assert sorted(r.doc_id for r in out) == [1, 3]  # first-seen wins
    assert "_fp" not in out[0].asDict()
