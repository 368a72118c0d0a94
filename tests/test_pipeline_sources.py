from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from syslog_ng_spark.operators.filters import severity_at_least
from syslog_ng_spark.operators.parsers import syslog_parser_3164
from syslog_ng_spark.plans.pipeline import LogPath, junction, split_path
from syslog_ng_spark.sinks import write_parquet
from syslog_ng_spark.sources.files import text_lines


def test_end_to_end_file_pipeline(spark):
    """source(file) → parser(syslog) → filter(severity) → destination(parquet),
    the reference's canonical log path, end to end."""
    lines = [
        "<11>Jan  5 03:04:05 web-01 app[77]: disk failure imminent",
        "<30>Jan  5 03:04:06 web-02 cron[12]: job ok",
        "<11>Jan  5 03:04:07 web-01 app[78]: disk failure imminent",
    ]
    with tempfile.TemporaryDirectory() as d:
        with open(d + "/in.log", "w") as f:
            f.write("\n".join(lines))
        src = text_lines(spark, d + "/in.log")
        path = (
            LogPath(src)
            .parser(syslog_parser_3164, year=2024)
            .filter(severity_at_least(F.col("severity"), "err"))
        )
        path.to(lambda df: write_parquet(df, d + "/out"))
        back = spark.read.parquet(d + "/out")
        assert back.count() == 2
        assert set(r.host for r in back.collect()) == {"web-01"}


def test_junction_and_split(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "v int")
    hi, lo = split_path(df, F.col("v") >= 5)
    assert hi.frame().count() == 5 and lo.frame().count() == 5
    merged = junction(hi, lo)
    assert merged.frame().count() == 10
