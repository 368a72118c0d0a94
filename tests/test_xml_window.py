from __future__ import annotations

from pyspark.sql import functions as F

from syslog_ng_spark.operators.parsers import xml_parser


def test_xml_parser_elements_and_attributes(spark):
    df = spark.createDataFrame(
        [('<e id="7"><name>disk</name><sev>3</sev></e>',)], "x string"
    )
    row = xml_parser(df, "x", "_id INT, name STRING, sev INT").collect()[0]
    assert row.xml_parsed._id == 7
    assert row.xml_parsed.name == "disk"
    assert row.xml_parsed.sev == 3


def test_xml_parser_malformed_gives_nulls(spark):
    df = spark.createDataFrame([("<broken",)], "x string")
    row = xml_parser(df, "x", "name STRING").collect()[0]
    assert row.xml_parsed is None or row.xml_parsed.name is None


def test_semi_anti_join_duality(spark):
    left = spark.createDataFrame([(i,) for i in range(10)], "k int")
    right = spark.createDataFrame([(i,) for i in range(0, 10, 2)], "k int")
    semi = {r.k for r in left.join(right, "k", "left_semi").collect()}
    anti = {r.k for r in left.join(right, "k", "left_anti").collect()}
    assert semi | anti == set(range(10)) and semi & anti == set()
    assert semi == {0, 2, 4, 6, 8}
