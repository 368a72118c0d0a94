from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from syslog_ng_spark.sinks import write_csv, write_json, write_parquet
from syslog_ng_spark.sources.files import csv_table, json_table, text_lines


def test_csv_source_roundtrip(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "c,d")], "k int, v string")
    with tempfile.TemporaryDirectory() as d:
        write_csv(df, d + "/out")
        back = csv_table(spark, d + "/out", schema="k int, v string")
        assert {(r.k, r.v) for r in back.collect()} == {(1, "a b"), (2, "c,d")}


def test_json_source_roundtrip(spark):
    df = spark.createDataFrame([(1, {"x": "1"}), (2, {"y": "2"})], "k int, m map<string,string>")
    with tempfile.TemporaryDirectory() as d:
        write_json(df, d + "/out")
        back = json_table(spark, d + "/out", schema="k int, m map<string,string>")
        got = {r.k: r.m for r in back.collect()}
        assert got == {1: {"x": "1"}, 2: {"y": "2"}}


def test_parquet_partitioned_destination(spark):
    """file() destinations with path macros (/logs/$HOST/...) map to
    partitionBy — verify the layout prunes by partition."""
    df = spark.createDataFrame(
        [("web-1", 3, "a"), ("web-1", 4, "b"), ("web-2", 3, "c")],
        "host string, severity int, message string",
    )
    with tempfile.TemporaryDirectory() as d:
        write_parquet(df, d + "/out", partition_by=["host"])
        back = spark.read.parquet(d + "/out")
        one = back.where(F.col("host") == "web-1")
        assert one.count() == 2
        # partition pruning visible in the scan
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            one.explain("formatted")
        assert "PartitionFilters" in buf.getvalue()


def test_text_lines_glob(spark):
    with tempfile.TemporaryDirectory() as d:
        for i, name in enumerate(["a.log", "b.log"]):
            with open(f"{d}/{name}", "w") as f:
                f.write(f"line{i}\n")
        df = text_lines(spark, d + "/*.log")
        assert sorted(r.raw for r in df.collect()) == ["line0", "line1"]
