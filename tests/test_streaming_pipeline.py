from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from syslog_ng_spark.operators.filters import severity_at_least
from syslog_ng_spark.operators.parsers import syslog_parser_3164


def test_streaming_syslog_pipeline(spark):
    """The reference's core loop as a stream: tail a log directory,
    parse RFC3164, filter by severity, land parquet — exactly-once via
    checkpoint."""
    lines1 = [
        "<11>Jan  5 03:04:05 web-01 app[77]: disk err A",
        "<30>Jan  5 03:04:06 web-02 cron[12]: ok",
    ]
    lines2 = [
        "<9>Jan  5 03:05:05 web-03 app[78]: disk err B",
    ]
    with tempfile.TemporaryDirectory() as d:
        import os

        os.makedirs(d + "/in")

        def land(name, lines):
            with open(f"{d}/in/{name}", "w") as f:
                f.write("\n".join(lines))

        def run_once():
            raw = spark.readStream.text(d + "/in").withColumnRenamed("value", "raw")
            parsed = syslog_parser_3164(raw, year=2024)
            errs = parsed.where(severity_at_least(F.col("severity"), "err"))
            q = (
                errs.writeStream.format("parquet")
                .option("path", d + "/out")
                .option("checkpointLocation", d + "/ck")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        land("a.log", lines1)
        run_once()
        land("b.log", lines2)
        run_once()
        out = spark.read.parquet(d + "/out")
        hosts = sorted(r.host for r in out.collect())
        assert hosts == ["web-01", "web-03"]  # info line filtered out
        # exactly-once: rerunning with no new files adds nothing
        run_once()
        assert spark.read.parquet(d + "/out").count() == 2


def test_patterndb_parse_works_on_streams(spark):
    """patterndb classification is a per-row expression, so the same
    call rides readStream unchanged (no window/state involved)."""
    import tempfile

    from syslog_ng_spark.operators.patterndb import patterndb_parse

    schema = "id long, message string"
    rules = [("auth_ok", "Accepted @ESTRING:method: @for @ANYSTRING:user@")]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, "Accepted publickey for root"), (2, "other line")], schema
        ).coalesce(1).write.parquet(d + "/in")
        q = (
            patterndb_parse(
                spark.readStream.schema(schema).parquet(d + "/in"), "message", rules
            )
            .writeStream.format("parquet")
            .option("path", d + "/out")
            .option("checkpointLocation", d + "/ck")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = {r.id: r for r in spark.read.parquet(d + "/out").collect()}
    assert rows[1]["class"] == "auth_ok" and rows[1].method == "publickey"
    assert rows[2]["class"] == "unknown"
