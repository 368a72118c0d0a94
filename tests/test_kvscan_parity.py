"""kv-scanner parity suite: the reference's own criterion cases
(lib/scanner/kv-scanner/tests/test_kv_scanner.c) ported against
operators/kvscan.py. Each table row is (input, [(key, value), ...])
under the named scanner config; all rows of a table evaluate in ONE
Spark job.

Not ported: the invalid-UTF-8 byte cases (\\xc3/\\xff raw bytes — a
JVM String normalizes them before the scan, a byte-level concern the
reference handles because it scans char*), the transform_value hook
(a C callback; the Spark analog is any Column transform over the
result), and the performance tests.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.operators.kvscan import (
    kv_scan_entries,
    kv_scanner_parser,
    kv_stray_words,
)

# ---- default config: kv_separator '=', pair_separator ", " -------------

DEFAULT_CASES = [
    # incomplete_string_returns_no_pairs
    ("", []),
    ("f", []),
    ("fo", []),
    ("foo", []),
    # name_equals_value_returns_a_pair
    ("foo=", [("foo", "")]),
    ("foo=b", [("foo", "b")]),
    ("foo=bar", [("foo", "bar")]),
    ("foo=barbar", [("foo", "barbar")]),
    # allowed_characters_in_a_key
    ("FOOfoo123-_._-321oofOOF=value", [("FOOfoo123-_._-321oofOOF", "value")]),
    # initial_stray_words_are_ignored
    ("lorem ipsum foo=bar", [("foo", "bar")]),
    ("lorem ipsum/dolor @sitamen foo=bar", [("foo", "bar")]),
    ('lorem ipsum/dolor = foo=bar"', [("dolor", ""), ("foo", 'bar"')]),
    ("a b c=d", [("c", "d")]),
    ("x *k=v", [("k", "v")]),
    # non_initial_stray_words_are_added_to_the_last_value
    ("foo=bar lorem ipsum key=value some more values",
     [("foo", "bar lorem ipsum"), ("key", "value some more values")]),
    # empty_values_in_a_series_of_key_values
    ("k= a=b c=d", [("k", ""), ("a", "b"), ("c", "d")]),
    ("k=v a= c=d", [("k", "v"), ("a", ""), ("c", "d")]),
    ("k=v a=b c=", [("k", "v"), ("a", "b"), ("c", "")]),
    # multiple_key_values_return_multiple_pairs
    ("key1=value1 key2=value2 key3=value3 ",
     [("key1", "value1"), ("key2", "value2"), ("key3", "value3")]),
    # spaces_between_values_are_ignored
    ("key1=value1    key2=value2     key3=value3 ",
     [("key1", "value1"), ("key2", "value2"), ("key3", "value3")]),
    # comma_separated_values
    ("key1=value1, key2=value2, key3=value3",
     [("key1", "value1"), ("key2", "value2"), ("key3", "value3")]),
    ("key1=value1,key2=value2,key3=value3",
     [("key1", "value1,key2=value2,key3=value3")]),
    ("key1=value1,   key2=value2  ,    key3=value3",
     [("key1", "value1"), ("key2", "value2"), ("key3", "value3")]),
    # tab_is_not_considered_a_separator
    ("key1=value1\tkey2=value2 key3=value3",
     [("key1", "value1\tkey2=value2"), ("key3", "value3")]),
    ("key1=value1,\tkey2=value2 key3=value3",
     [("key1", "value1,\tkey2=value2"), ("key3", "value3")]),
    ("key1=value1\t key2=value2 key3=value3",
     [("key1", "value1\t"), ("key2", "value2"), ("key3", "value3")]),
    ("k=\t", [("k", "\t")]),
    ("k=,\t", [("k", ",\t")]),
    # quoted_values_are_unquoted_like_c_strings
    ('foo="\\"" bar=baz', [("foo", '"'), ("bar", "baz")]),
    ("foo='\"' bar=baz", [("foo", '"'), ("bar", "baz")]),
    ('foo="bar"', [("foo", "bar")]),
    ('key1="value1" key2="value2"', [("key1", "value1"), ("key2", "value2")]),
    ('key1="\\"value1"', [("key1", '"value1')]),
    ('key1="\\b \\f \\n \\r \\t \\\\"', [("key1", "\b \f \n \r \t \\")]),
    ('key1="\\p"', [("key1", "\\p")]),
    ("key1='value1' key2='value2'", [("key1", "value1"), ("key2", "value2")]),
    ("key1='\\'value1'", [("key1", "'value1")]),
    ("key1='\\b \\f \\n \\r \\t \\\\'", [("key1", "\b \f \n \r \t \\")]),
    ("key1='\\p'", [("key1", "\\p")]),
    ("key1=\\b\\f\\n\\r\\t\\\\", [("key1", "\\b\\f\\n\\r\\t\\\\")]),
    ("key1=\b\f\n\r\\", [("key1", "\b\f\n\r\\")]),
    ('foo="bar baz"', [("foo", "bar baz")]),
    # quotes_embedded_in_an_unquoted_value_are_left_intact
    ('foo=a "bar baz" ', [("foo", 'a "bar baz"')]),
    ('foo=a "bar baz', [("foo", 'a "bar baz')]),
    ('foo=a "bar baz c=d', [("foo", 'a "bar baz'), ("c", "d")]),
    ('foo=a "bar baz"=f c=d a', [("foo", 'a "bar baz"=f'), ("c", "d a")]),
    ('foo=\\"bar baz\\"', [("foo", '\\"bar baz\\"')]),
    # separator_in_an_unquoted_value_is_taken_literally
    ("k=a=b c=d", [("k", "a=b"), ("c", "d")]),
    ("a==b=", [("a", "=b=")]),
    ("a=,=b=a", [("a", ",=b=a")]),
    ("a= =a", [("a", "=a")]),
    # keys_without_value_separator_are_ignored
    ("key1 key2=value2 key3 key4=value4",
     [("key2", "value2 key3"), ("key4", "value4")]),
    ("key1= key2=value2 key3= key4=value4 key5= key6=value6",
     [("key1", ""), ("key2", "value2"), ("key3", ""),
      ("key4", "value4"), ("key5", ""), ("key6", "value6")]),
    # quoted_values_are_considered_one_token
    ('key1="value foo" key2=marker', [("key1", "value foo"), ("key2", "marker")]),
    ('key1="value foo embedded_key=emb_value" key2=marker',
     [("key1", "value foo embedded_key=emb_value"), ("key2", "marker")]),
    ('key1="value foo\\"" key2=marker', [("key1", 'value foo"'), ("key2", "marker")]),
    ("key1='value foo\\'' key2=marker", [("key1", "value foo'"), ("key2", "marker")]),
    ('key1="value foo, foo2 =@,\\"" key2=\'value foo,  a=\'',
     [("key1", 'value foo, foo2 =@,"'), ("key2", "value foo,  a=")]),
    ('foo="bar" baz c=d', [("foo", "bar"), ("c", "d")]),
    # empty_keys
    ("=v", []),
    ("k*=v", []),
    ("=", []),
    ("==", []),
    ("===", []),
    (" =", []),
    (" ==", []),
    (" ===", []),
    (" = =", []),
    (" ==k=", [("k", "")]),
    (" = =k=", [("k", "")]),
    (" =k=", [("k", "")]),
    (" =k=v", [("k", "v")]),
    (" ==k=v", [("k", "v")]),
    (" =k=v=w", [("k", "v=w")]),
    # unclosed_quotes
    ('k="a', [("k", '"a')]),
    ("k=\\", [("k", "\\")]),
    ('k="\\', [("k", '"\\')]),
    ("k='a", [("k", "'a")]),
    ("k='\\", [("k", "'\\")]),
    ('foo=bar"', [("foo", 'bar"')]),
    ("foo='bar", [("foo", "'bar")]),
    # comma_separator
    (", k=v", [("k", "v")]),
    (",k=v", [("k", "v")]),
    ("k=v,", [("k", "v,")]),
    ("k=v, ", [("k", "v")]),
    # multiple_separators
    ("k==", [("k", "=")]),
    ("k===", [("k", "==")]),
    ("k===a", [("k", "==a")]),
    ("k===a=b", [("k", "==a=b")]),
    # keys_only_use_a_restricted_set_of_characters
    ("k-j=v", [("k-j", "v")]),
    ("0=v", [("0", "v")]),
    ("_=v", [("_", "v")]),
    (":=v", []),
    (":=", []),
    ("Z=v", [("Z", "v")]),
    ("á=v", []),
    ("*k=v", [("k", "v")]),
    # unquoted_values_can_have_embedded_control_characters
    ("k1=\\b\\f\\n\\r\\t\\\\", [("k1", "\\b\\f\\n\\r\\t\\\\")]),
    ("k1=\b\f\n\r\\", [("k1", "\b\f\n\r\\")]),
    # spaces_are_trimmed_between_key_and_separator
    ("foo =bar", [("foo", "bar")]),
    ("foo= bar", [("foo", "bar")]),
    # space_is_only_a_delimiter_if_a_key_follows
    ("foo=bar ggg", [("foo", "bar ggg")]),
    ("foo=bar ggg baz=ez", [("foo", "bar ggg"), ("baz", "ez")]),
    # spaces_are_trimmed_from_key_names
    (" foo =bar ggg baz=ez", [("foo", "bar ggg"), ("baz", "ez")]),
    ("foo =bar ggg baz=ez", [("foo", "bar ggg"), ("baz", "ez")]),
    (" foo=bar ggg baz=ez", [("foo", "bar ggg"), ("baz", "ez")]),
    ("foo =  bar ggg baz   =   ez", [("foo", "bar ggg"), ("baz", "ez")]),
    ("k===  a", [("k", "==  a")]),
    # initial_spaces_are_trimmed_from_values
    (" k= b", [("k", "b")]),
    # quotation error: a closed quote NOT followed by a delimiter
    # scans as a literal (str-repr decode.c test: 'alma'@korte FAILS
    # and keeps the raw text)
    ("k='alma'@korte", [("k", "'alma'@korte")]),
    ('k="alma"x j=1', [("k", '"alma"x'), ("j", "1")]),
]

# value_separator ':' (spaces_around_value_separator_are_ignored +
# value_separator_is_used_to_separate_key_from_value)
COLON_CASES = [
    ('key1: "value1" key2 : value2 key3 :value3 ',
     [("key1", "value1"), ("key2", "value2"), ("key3", "value3")]),
    ("key1:value1 key2:value2 key3:value3 ",
     [("key1", "value1"), ("key2", "value2"), ("key3", "value3")]),
]

# value_separator '-' (separator_in_key)
DASH_CASES = [
    ("k-v", [("k", "v")]),
    ("k--v", [("k", "-v")]),
    ("---", [("-", "-")]),
]

# pair_separator " " (pair_separator_space_disables_space_related_heuristics)
SPACE_SEP_CASES = [
    ("foo=v1 v2 bar=v3 v4", [("foo", "v1"), ("bar", "v3")]),
]

# pair_separator "   "
TRIPLE_SPACE_SEP_CASES = [
    ("foo=v1 v2   bar=v3 v4  ", [("foo", "v1 v2"), ("bar", "v3 v4")]),
]

# pair_separator ";" (pair_separator_causes_values_to_be_split)
SEMI_SEP_CASES = [
    ("foo=bar; bar=foo;", [("foo", "bar"), ("bar", "foo")]),
    ("foo=bar;bar=foo;baz=foo", [("foo", "bar"), ("bar", "foo"), ("baz", "foo")]),
    ("foo=bar;bar=foo;", [("foo", "bar"), ("bar", "foo")]),
    ("foo=bar baz;bar=foo;", [("foo", "bar baz"), ("bar", "foo")]),
    ("foo=bar baz  ;bar=foo;", [("foo", "bar baz"), ("bar", "foo")]),
]


def _run_table(spark, cases, kv_sep="=", pair_sep=", "):
    df = spark.createDataFrame(
        [(i, text) for i, (text, _) in enumerate(cases)], "i int, raw string"
    )
    rows = (
        df.select("i", kv_scan_entries("raw", kv_sep, pair_sep).alias("e"))
        .orderBy("i")
        .collect()
    )
    failures = []
    for row, (text, expected) in zip(rows, cases):
        got = [(e["key"], e["value"]) for e in row["e"]]
        if got != expected:
            failures.append(f"{text!r}: got {got}, want {expected}")
    assert not failures, "\n".join(failures)


def test_default_config_cases(spark):
    _run_table(spark, DEFAULT_CASES)


def test_colon_separator_cases(spark):
    _run_table(spark, COLON_CASES, kv_sep=":")


def test_dash_separator_cases(spark):
    _run_table(spark, DASH_CASES, kv_sep="-")


def test_space_pair_separator_cases(spark):
    _run_table(spark, SPACE_SEP_CASES, pair_sep=" ")


def test_triple_space_pair_separator_cases(spark):
    _run_table(spark, TRIPLE_SPACE_SEP_CASES, pair_sep="   ")


def test_semicolon_pair_separator_cases(spark):
    _run_table(spark, SEMI_SEP_CASES, pair_sep=";")


def test_was_quoted_flag(spark):
    """quotation_is_stored_in_the_was_quoted_value_member"""
    df = spark.createDataFrame([("foo='bar' k=v",)], "raw string")
    e = df.select(kv_scan_entries("raw").alias("e")).collect()[0]["e"]
    assert [(x["key"], x["value"], x["was_quoted"]) for x in e] == [
        ("foo", "bar", True),
        ("k", "v", False),
    ]


def test_stray_words_are_stored(spark):
    cases = [
        ("foo=bar", ""),
        ("alma foo=bar", "alma"),
        ("alma foo=bar, korte bar=foo", "alma,korte"),
        ("alma foo=bar, korte bar=foo, narancs", "alma,korte,narancs"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "i int, raw string"
    )
    rows = df.select("i", kv_stray_words("raw").alias("s")).orderBy("i").collect()
    for row, (text, want) in zip(rows, cases):
        assert row["s"] == want, f"{text!r}: got {row['s']!r}, want {want!r}"


def test_parser_map_fold_last_wins(spark):
    df = spark.createDataFrame([("a=1 b=2 a=3",)], "raw string")
    out = kv_scanner_parser(df, "raw").collect()[0]["kv"]
    assert out == {"a": "3", "b": "2"}


def test_parser_stray_words_target(spark):
    df = spark.createDataFrame([("hello a=1 world b=2",)], "raw string")
    row = kv_scanner_parser(df, "raw", stray_words_target="stray").collect()[0]
    assert row["kv"] == {"a": "1 world", "b": "2"}
    assert row["stray"] == "hello"
