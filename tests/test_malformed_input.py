"""Malformed-input sweep: every parser must degrade to nulls/unset on
garbage, never throw under Spark 4's default ANSI mode (the failure
class the template compiler hardening fixed — gates run clean data,
so crashes on dirty data stay invisible without this)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.operators.parsers import (
    csv_parser,
    date_parser,
    json_parser,
    kv_parser,
    syslog_parser_3164,
    syslog_parser_5424,
)

GARBAGE = [
    "",
    " ",
    "<>",
    "<999>",
    "not a syslog line at all",
    "=====",
    "a=b=c=d====",
    '{"unclosed": ',
    "«weird™ bytes»",
    "<13>Feb 99 99:99:99 bad",
    "1,2,3,4,5,6,7,8,9,10",
    "\t\t\t",
    "$(){}[]\\|@@",
]


def _garbage_df(spark):
    return spark.createDataFrame([(i, g) for i, g in enumerate(GARBAGE)], "id long, raw string")


@pytest.mark.parametrize(
    "apply_parser",
    [
        lambda df: syslog_parser_3164(df, raw="raw", year=2024),
        lambda df: syslog_parser_5424(df, raw="raw"),
        lambda df: kv_parser(df, "raw"),
        lambda df: json_parser(df, "raw", target="sdata"),
        lambda df: csv_parser(df, "raw", ["a", "b", "c"]),
        lambda df: date_parser(df, "raw", "yyyy-MM-dd HH:mm:ss"),
    ],
    ids=["3164", "5424", "kv", "json", "csv", "date"],
)
def test_parsers_survive_garbage(spark, apply_parser):
    out = apply_parser(_garbage_df(spark))
    rows = out.collect()  # must not throw
    assert len(rows) == len(GARBAGE)


def test_template_render_survives_garbage(spark):
    from syslog_ng_spark.template import compile_template

    df = _garbage_df(spark).select(
        F.col("id"),
        F.col("raw").alias("message"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("string").alias("host"),
        F.lit(None).cast("string").alias("program"),
        F.lit(None).cast("int").alias("pid"),
        F.lit(None).cast("int").alias("facility"),
        F.lit(None).cast("int").alias("severity"),
        F.lit(None).cast("map<string,string>").alias("sdata"),
        F.lit(None).cast("array<string>").alias("tags"),
    )
    tpl = (
        "<$PRI>$ISODATE $HOST $MSGHDR$MSG $(+ $MSG 1) $(round $MSG 2) "
        "$(/ $PID 0) $(list-nth 99 $MSG) ${nope:-d} $(sha1 $MSG)"
    )
    rows = df.select(compile_template(tpl, df).alias("line")).collect()
    assert len(rows) == len(GARBAGE)
    assert all(r.line is not None for r in rows)


def test_patterndb_survives_garbage(spark):
    from syslog_ng_spark.operators.patterndb import patterndb_parse

    rules = [("c", "x=@NUMBER:n@ @QSTRING:q:\"@ @IPv4:ip@")]
    out = patterndb_parse(_garbage_df(spark), "raw", rules).collect()
    assert all(r["class"] == "unknown" for r in out)
