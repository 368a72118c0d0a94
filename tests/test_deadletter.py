from __future__ import annotations

from pyspark.sql import functions as F

from syslog_ng_spark.operators.parsers import syslog_parser_3164
from syslog_ng_spark.plans.pipeline import split_path


def test_parse_failures_route_to_fallback(spark):
    """flags(fallback): lines the parser can't handle route to a
    dead-letter path instead of being dropped (the reference's fallback
    log path) — nothing is lost, both halves partition the input."""
    lines = [
        ("<11>Jan  5 03:04:05 web-01 app[77]: good line",),
        ("totally not syslog",),
        ("<30>Jan  5 03:04:06 web-02 cron[12]: also good",),
        ("{json noise}",),
    ]
    raw = spark.createDataFrame(lines, "raw string")
    parsed = syslog_parser_3164(raw.withColumn("_orig", F.col("raw")), year=2024)
    ok, dead = split_path(parsed, F.col("host").isNotNull())
    assert ok.frame().count() == 2
    dead_rows = [r._orig for r in dead.frame().collect()]
    assert sorted(dead_rows) == ["totally not syslog", "{json noise}"]
    assert ok.frame().count() + dead.frame().count() == 4
