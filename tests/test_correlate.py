from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from syslog_ng_spark.operators.correlate import grouping_by, sessionize


def _events(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: two sessions split by a 2h gap
        (1, base, 1.0, 1),
        (1, base + datetime.timedelta(minutes=10), 2.0, 2),
        (1, base + datetime.timedelta(hours=3), 3.0, 3),
        # user 2: one event exactly at the timeout boundary (gap == timeout
        # → same session; the reference expires strictly after timeout)
        (2, base, 5.0, 4),
        (2, base + datetime.timedelta(seconds=1800), 6.0, 5),
    ]
    return spark.createDataFrame(rows, "user_id int, ts timestamp, value double, event_id int")


def test_sessionize_gap_split(spark):
    out = sessionize(_events(spark), ["user_id"], timeout=1800, order_tiebreak="event_id")
    got = {(r.user_id, r.event_id): r.session_id for r in out.collect()}
    assert got[(1, 1)] == 0 and got[(1, 2)] == 0
    assert got[(1, 3)] == 1
    assert got[(2, 4)] == 0 and got[(2, 5)] == 0  # boundary stays open


def test_grouping_by_aggregates_and_having(spark):
    out = grouping_by(
        _events(spark),
        key=["user_id"],
        aggregates={"sum_value": F.sum("value")},
        timeout=1800,
        having=F.col("context_length") >= 2,
        order_tiebreak="event_id",
    ).collect()
    assert len(out) == 2
    by_user = {r.user_id: r for r in out}
    assert by_user[1].context_length == 2 and by_user[1].sum_value == 3.0
    assert by_user[2].sum_value == 11.0
    assert by_user[2].time_last - by_user[2].time_first == datetime.timedelta(seconds=1800)


def test_sessionize_accepts_timestamp_ntz(spark):
    # The driver's parquet ships TIMESTAMP_NTZ; Spark 4 forbids a direct
    # NTZ→double cast, so sessionize must hop through TIMESTAMP
    # (util.epoch_seconds). Same data as _events, NTZ-typed.
    ntz = _events(spark).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = sessionize(ntz, ["user_id"], timeout=1800, order_tiebreak="event_id")
    got = {(r.user_id, r.event_id): r.session_id for r in out.collect()}
    assert got[(1, 3)] == 1 and got[(2, 5)] == 0


def test_stardate_accepts_timestamp_ntz(spark):
    from syslog_ng_spark.functions.format import stardate

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 7, 2),)], "ts timestamp"
    ).withColumn("ts_ntz", F.col("ts").cast("timestamp_ntz"))
    row = df.select(
        stardate(F.col("ts")).alias("a"), stardate(F.col("ts_ntz")).alias("b")
    ).collect()[0]
    assert row.a == row.b == 2024.5


def test_suppress_collapses_repeats(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("h1", "disk full", base),
        ("h1", "disk full", base + dt.timedelta(seconds=10)),   # suppressed
        ("h1", "disk full", base + dt.timedelta(seconds=25)),   # suppressed (25-10 < 30)
        ("h1", "disk full", base + dt.timedelta(seconds=90)),   # new run (gap 65s)
        ("h1", "other msg", base + dt.timedelta(seconds=5)),    # different message
        ("h2", "disk full", base),                              # different host
    ]
    df = spark.createDataFrame(rows, "host string, message string, ts timestamp")
    from syslog_ng_spark.operators.correlate import suppress

    out = suppress(df, ["host", "message"], seconds=30)
    got = {
        (r.host, r.message, r.session_id): r.n_suppressed for r in out.collect()
    }
    assert got[("h1", "disk full", 0)] == 2   # 'repeated 2 times'
    assert got[("h1", "disk full", 1)] == 0
    assert got[("h1", "other msg", 0)] == 0
    assert got[("h2", "disk full", 0)] == 0
