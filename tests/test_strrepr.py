"""functions/strrepr.py — the ONE quoting implementation shared by
the template list model and the kv-scanner (lib/str-repr encode.c /
decode.c)."""
from __future__ import annotations

import inspect

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.functions.strrepr import (
    decode_quoted_token,
    encode_elem,
    is_quoted_token,
)


def test_encode_elem_is_unary():
    """F.transform arity-sniffs lambdas: a second (even defaulted)
    parameter receives the array INDEX column — encode_elem crashed
    the whole template list surface in r11 until this contract was
    pinned (re.escape(Column) inside the lambda)."""
    params = inspect.signature(encode_elem).parameters
    assert len(params) == 1, "encode_elem must stay single-parameter"


@pytest.mark.parametrize(
    "value,expected_encoded",
    [
        ("plain", "plain"),
        ("", '""'),
        ("a,b", '"a,b"'),
        ("has space", '"has space"'),
        ('say "hi"', "'say \"hi\"'"),
        ("it's", '"it\'s"'),
        ("a\tb", '"a\\tb"'),
        ("back\\slash", '"back\\\\slash"'),
    ],
)
def test_encode_decode_roundtrip(spark, value, expected_encoded):
    df = spark.createDataFrame([(value,)], "v string")
    row = df.select(
        encode_elem(F.col("v")).alias("enc"),
        decode_quoted_token(encode_elem(F.col("v"))).alias("rt"),
    ).collect()[0]
    assert row["enc"] == expected_encoded
    assert row["rt"] == value


def test_transform_over_encode_elem(spark):
    """The exact call shape that broke: F.transform(arr, encode_elem)."""
    df = spark.createDataFrame([(["a", "b,c", ""],)], "arr array<string>")
    row = df.select(
        F.array_join(F.transform(F.col("arr"), encode_elem), ",").alias("j")
    ).collect()[0]
    assert row["j"] == 'a,"b,c",""'


def test_is_quoted_token(spark):
    df = spark.createDataFrame(
        [('"x"',), ("'y'",), ("bare",), ('"unclosed',), ('""',)], "t string"
    )
    vals = [r[0] for r in df.select(is_quoted_token(F.col("t"))).collect()]
    assert vals == [True, True, False, False, True]


# ---- ported criterion tables (lib/str-repr/tests) -----------------------

ENCODE_CASES = [
    # test_encode.c ParameterizedTestParameters(encode, test_strings)
    ("", '""'),
    ("a", "a"),
    ("alma", "alma"),
    ("al\nma", '"al\\nma"'),
    ("foo bar", '"foo bar"'),
    ('"value1', "'\"value1'"),
    ("'value1", '"\'value1"'),
    ("\b \f \n \r \t \\", '"\\b \\f \\n \\r \\t \\\\"'),
    # test_encode_strings_that_need_quotation (forbidden ",")
    ("foo,", '"foo,"'),
    # BOTH quote kinds: double-quote wrap, inner '"' escapes as \"
    # (utf8utils escaped-binary with unsafe_chars='"')
    ("\"'foo,", '"\\"\'foo,"'),
]


def test_encode_criterion_cases(spark):
    df = spark.createDataFrame(
        [(i, v) for i, (v, _) in enumerate(ENCODE_CASES)], "i int, v string"
    )
    rows = df.select("i", encode_elem(F.col("v")).alias("e")).orderBy("i").collect()
    for row, (v, want) in zip(rows, ENCODE_CASES):
        assert row["e"] == want, f"{v!r}: got {row['e']!r}, want {want!r}"


DECODE_CASES = [
    # test_decode.c (token-level: our decoder takes ONE token)
    ('"al ma"', "al ma"),
    ('"\\"value1"', '"value1'),
    ('"\\b \\f \\n \\r \\t \\\\"', "\b \f \n \r \t \\"),
    ('"\\p"', "\\p"),
    ("'al ma'", "al ma"),
    ("'\\'value1'", "'value1"),
    ("'\\b \\f \\n \\r \\t \\\\'", "\b \f \n \r \t \\"),
    ("'\\p'", "\\p"),
    # malformed: pass through verbatim (decode failure keeps raw)
    ("'alma", "'alma"),
    ('"alma', '"alma'),
    ("alma'", "alma'"),
    ('alma"', 'alma"'),
    ('alma"korte', 'alma"korte'),
    ('alma"korte"', 'alma"korte"'),
]


def test_decode_criterion_cases(spark):
    df = spark.createDataFrame(
        [(i, v) for i, (v, _) in enumerate(DECODE_CASES)], "i int, v string"
    )
    rows = df.select(
        "i", decode_quoted_token(F.col("v")).alias("d")
    ).orderBy("i").collect()
    for row, (v, want) in zip(rows, DECODE_CASES):
        assert row["d"] == want, f"{v!r}: got {row['d']!r}, want {want!r}"
