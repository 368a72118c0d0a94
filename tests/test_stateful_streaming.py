from __future__ import annotations

import datetime
import tempfile

from syslog_ng_spark.streaming.stateful import grouping_by_stateful, token_bucket_rate_limit

BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "user_id long, ts timestamp, value double"


def _run(spark, d, build, phases):
    for i, rows in enumerate(phases):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(d + "/in")
        stream = spark.readStream.schema(SCHEMA).parquet(d + "/in")
        q = (
            build(stream)
            .writeStream.format("parquet")
            .option("path", d + "/out")
            .option("checkpointLocation", d + "/ck")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    return spark.read.parquet(d + "/out").collect()


def test_stateful_grouping_by_timeout_and_trigger(spark):
    phase1 = [
        (1, BASE, 1.0),
        (1, BASE + datetime.timedelta(minutes=5), 2.0),
        # user 2 fires the trigger (3 messages) immediately
        (2, BASE, 1.0),
        (2, BASE + datetime.timedelta(seconds=1), 1.0),
        (2, BASE + datetime.timedelta(seconds=2), 1.0),
    ]
    phase2 = [(99, BASE + datetime.timedelta(days=1), 0.0)]  # watermark pusher
    with tempfile.TemporaryDirectory() as d:
        rows = _run(
            spark,
            d,
            lambda s: grouping_by_stateful(
                s, timeout=1800, watermark="10 minutes", trigger_count=3
            ),
            [phase1, phase2],
        )
    by = {(r.user_id, r.closed_by): r for r in rows}
    assert by[(2, "trigger")].context_length == 3
    assert by[(2, "trigger")].sum_value == 3.0
    assert by[(1, "timeout")].context_length == 2
    assert by[(1, "timeout")].sum_value == 3.0
    assert by[(1, "timeout")].time_last - by[(1, "timeout")].time_first == datetime.timedelta(
        minutes=5
    )


def test_token_bucket_exact_admission(spark):
    # 20 events 0.1s apart; rate 1/s, burst 5 → 5 from the bucket plus
    # ~2 refilled over the 1.9s span → 6-7 pass (refill math is exact:
    # 1.9s * 1/s = 1.9 tokens)
    phase1 = [(1, BASE + datetime.timedelta(milliseconds=100 * i), 1.0) for i in range(20)]
    with tempfile.TemporaryDirectory() as d:
        rows = _run(
            spark,
            d,
            lambda s: token_bucket_rate_limit(s, rate_per_sec=1.0, burst=5),
            [phase1],
        )
    assert len(rows) == 1
    r = rows[0]
    assert r.batch_passed + r.batch_dropped == 20
    assert r.batch_passed == 6  # 5 burst + floor(1.9) refilled
