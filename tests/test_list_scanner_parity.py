"""list-scanner parity: the reference's criterion suite
(lib/scanner/list-scanner/tests/test_list_scanner.c) ported against
the template quoted-list model (template._split_list — the tokenizer
behind every $(list-*) function). Multi-arg scanner inputs map to the
comma-join the template layer performs (_list_col concat_ws), exactly
like list_scanner_input_va feeding consecutive args.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from syslog_ng_spark.template import _split_list

# (input-as-joined-string, expected element list). Multi-arg cases
# are joined with ',' — list_scanner treats arg boundaries and commas
# the same (comma_and_arg_are_equivalent).
CASES = [
    # individual_items_are_scanned
    ("foo", ["foo"]),
    ("foo,bar", ["foo", "bar"]),
    ("foo,bar,baz", ["foo", "bar", "baz"]),
    # unquoted_empty_items_are_skipped
    ("", []),
    (",foo,bar", ["foo", "bar"]),
    (",,,,,,,,,,foo,bar", ["foo", "bar"]),
    ("foo,,bar", ["foo", "bar"]),
    ("foo,", ["foo"]),
    ("'',,foo,,bar,,,baz,foobar,\"\"", ["", "foo", "bar", "baz", "foobar", ""]),
    # quoted_empty_items_are_parsed_as_empty_values
    ("foo,'',bar", ["foo", "", "bar"]),
    # comma_and_arg_are_equivalent
    ("foo,bar,baz,xxx,,yyy", ["foo", "bar", "baz", "xxx", "yyy"]),
    # handles_single_quotes
    ("'foo'", ["foo"]),
    ("'foo','bar'", ["foo", "bar"]),
    ("'foo,bar'", ["foo,bar"]),
    ("'foo''bar'", ["'foo''bar'"]),
    ("'foo'bar", ["'foo'bar"]),
    # handles_double_quotes
    ('"foo"', ["foo"]),
    ('"\\"foo"', ['"foo']),
    ('"foo","bar"', ["foo", "bar"]),
    ('"foo,bar"', ["foo,bar"]),
    ('"foo""bar"', ['"foo""bar"']),
    ('"foo"bar', ['"foo"bar']),
    # malformed_quotes
    ("'foo", ["'foo"]),
    ("bar,'foo", ["bar", "'foo"]),
    ("bar,'foo,", ["bar", "'foo,"]),
    ('"foo', ['"foo']),
    ('bar,"foo', ["bar", '"foo']),
    ('bar,"foo,', ["bar", '"foo,']),
]


def test_list_scanner_criterion_cases(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES)], "i int, t string"
    )
    rows = df.select("i", _split_list(F.col("t")).alias("l")).orderBy("i").collect()
    failures = []
    for row, (t, want) in zip(rows, CASES):
        got = list(row["l"])
        if got != want:
            failures.append(f"{t!r}: got {got}, want {want}")
    assert not failures, "\n".join(failures)
