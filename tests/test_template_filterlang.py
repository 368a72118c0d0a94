"""Filter-expression strings in $(if)/$(grep)/$(context-lookup)/
$(filter) — the reference parses these with the FULL filter grammar
(modules/basicfuncs/cond-funcs.c tf_cond_prepare runs
filter_expr_parser over the raw argument). Cases ported from
modules/basicfuncs/tests/test_basicfuncs.c test_cond_funcs
(lines 132-170), same sample message/context (2 copies of the
bzorp/syslog-ng/23323/local3 message)."""

from __future__ import annotations

import datetime as dt

import pytest

from syslog_ng_spark.template import compile_template


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
        "sdata": {},
        "tags": ["alma", "korte"],
    }
    return spark.createDataFrame(
        [row],
        "ts timestamp, host string, program string, pid int, facility int, "
        "severity int, message string, sdata map<string,string>, tags array<string>",
    )


@pytest.fixture(scope="module")
def ctx(spark):
    # assert_template_format_with_context: the context is the sample
    # message twice
    m = (23323, "syslog-ng", 19, 3)
    return spark.createDataFrame(
        [(1, [m, m])],
        "k int, ctx array<struct<pid:int, program:string, facility:int, severity:int>>",
    )


IF_CASES = [
    # test_basicfuncs.c:141-161
    ("$(if 'facility(local4)' alma korte)", "korte"),
    ("$(if 'facility(local3)' alma korte)", "alma"),
    ('$(if \'"$FACILITY" lt "local3"\' alma korte)', "korte"),
    ('$(if \'"$FACILITY" le "local3"\' alma korte)', "alma"),
    ('$(if \'"$FACILITY" eq "local3"\' alma korte)', "alma"),
    ('$(if \'"$FACILITY" ne "local3"\' alma korte)', "korte"),
    ('$(if \'"$FACILITY" gt "local3"\' alma korte)', "korte"),
    ('$(if \'"$FACILITY" ge "local3"\' alma korte)', "alma"),
    ('$(if \'"$FACILITY_NUM" < "19"\' alma korte)', "korte"),
    ('$(if \'"$FACILITY_NUM" <= "19"\' alma korte)', "alma"),
    ('$(if \'"$FACILITY_NUM" == "19"\' alma korte)', "alma"),
    ('$(if \'"$FACILITY_NUM" != "19"\' alma korte)', "korte"),
    ('$(if \'"$FACILITY_NUM" > "19"\' alma korte)', "korte"),
    ('$(if \'"$FACILITY_NUM" >= "19"\' alma korte)', "alma"),
    ('$(if \'"$FACILITY_NUM" >= "19" and "kicsi" eq "nagy"\' alma korte)', "korte"),
    ('$(if \'"$FACILITY_NUM" >= "19" or "kicsi" eq "nagy"\' alma korte)', "alma"),
    ("$(if program(\"slog-ng\" type(pcre)) alma korte)", "alma"),
]


@pytest.mark.parametrize("template,expected", IF_CASES)
def test_if_filter_language(msg, template, expected):
    got = msg.select(compile_template(template, msg).alias("v")).collect()[0].v
    assert got == expected


GREP_CASES = [
    # test_basicfuncs.c:132-139 (@N message addressing excluded)
    ("$(grep 'facility(local3)' $PID)", "23323,23323"),
    ("$(grep -m 1 'facility(local3)' $PID)", "23323"),
    ("$(grep --max-count 1 'facility(local3)' $PID)", "23323"),
    ("$(grep 'facility(local3)' $PID $PROGRAM)", "23323,syslog-ng,23323,syslog-ng"),
    ("$(grep 'facility(local4)' $PID)", ""),
    ("$(grep ('$FACILITY' eq 'local4') $PID)", ""),
    ("$(grep ('$FACILITY(' eq 'local3(') $PID)", "23323,23323"),
    ("$(grep ('$FACILITY(' eq 'local4)') $PID)", ""),
    ("$(context-lookup 'facility(local3)' $PID)", "23323,23323"),
]


@pytest.mark.parametrize("template,expected", GREP_CASES)
def test_grep_filter_language(ctx, template, expected):
    got = ctx.select(
        compile_template(template, ctx, context_col="ctx").alias("v")
    ).collect()[0].v
    assert got == expected


def test_filter_fn_atoi_semantics(spark):
    """$(filter) symbolic ops go through filter-cmp's atoi: a
    non-numeric element compares as 0 (filter-cmp.c)."""
    df = spark.createDataFrame([("5,1,x,0",)], "l string")
    got = df.select(
        compile_template('$(filter ("$_" < "2") $l)', df).alias("v")
    ).collect()[0].v
    assert got == "1,x,0"


def test_msg_ref_addressing(spark):
    """'@N' correlation-state suffix (lib/template/compiler.c
    parse_msg_ref + eval.c: message N counted back from the latest;
    beyond the context renders unset; '@@' is a literal '@')."""
    m0 = (111, "app-a", 19, 3)
    m1 = (23323, "syslog-ng", 19, 3)
    df = spark.createDataFrame(
        [(1, [m0, m1])],
        "k int, ctx array<struct<pid:int, program:string, facility:int, severity:int>>",
    )

    def rc(t):
        return df.select(compile_template(t, df, context_col="ctx").alias("v")).collect()[0].v

    # test_basicfuncs.c:163-165
    assert rc("$(grep 'facility(local3)' $PID)@0") == "23323"
    assert rc("$(grep 'facility(local3)' $PID)@1") == "111"
    assert rc("$(grep 'facility(local3)' $PID)@2") == ""
    assert rc("$PID@0") == "23323"
    assert rc("$PID@1") == "111"
    assert rc("$PID@5") == ""
    assert rc("a$k@@b") == "a1@b"


def test_grep_severity_range(ctx):
    """severity range filters work per context row."""
    got = ctx.select(
        compile_template(
            "$(grep 'level(err..emerg)' $PID)", ctx, context_col="ctx"
        ).alias("v")
    ).collect()[0].v
    assert got == "23323,23323"
