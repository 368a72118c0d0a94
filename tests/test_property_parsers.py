"""Property tests: arbitrary well-formed messages survive the
construct → serialize → parse round-trip (the reference's fuzz-style
parser tests, e.g. modules/syslogformat/tests)."""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from syslog_ng_spark.operators.parsers import (
    kv_parser_quoted,
    syslog_parser_3164,
    syslog_parser_5424,
)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from syslog_ng_spark.session import get_session

        _spark = get_session("syslog-ng-spark-tests", cpus="8")
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


host_st = st.from_regex(r"[a-z][a-z0-9\-]{0,20}", fullmatch=True)
prog_st = st.from_regex(r"[a-zA-Z][a-zA-Z0-9_\-]{0,15}", fullmatch=True)
msg_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=0, max_size=60
)
ts_st = st.datetimes(
    min_value=datetime.datetime(2024, 1, 1), max_value=datetime.datetime(2024, 12, 28)
).map(lambda d: d.replace(microsecond=0))


@settings(max_examples=12, deadline=None)
@given(
    pri=st.integers(0, 191),
    host=host_st,
    prog=prog_st,
    pid=st.integers(1, 99999),
    msg=msg_st,
    ts=ts_st,
)
def test_3164_roundtrip(pri, host, prog, pid, msg, ts):
    spark = _get_spark()
    bsd = f"{ts.strftime('%b')} {ts.day:2d} {ts.strftime('%H:%M:%S')}"
    raw = f"<{pri}>{bsd} {host} {prog}[{pid}]: {msg}"
    row = syslog_parser_3164(
        spark.createDataFrame([(raw,)], "raw string"), year=ts.year
    ).collect()[0]
    assert row.facility == pri // 8 and row.severity == pri % 8
    assert row.host == host and row.program == prog and row.pid == pid
    assert row.message == msg
    assert row.ts == ts


@settings(max_examples=12, deadline=None)
@given(
    pri=st.integers(0, 191),
    host=host_st,
    prog=prog_st,
    pid=st.integers(1, 99999),
    msg=msg_st.filter(lambda s: not s.startswith("[")),
    val=st.text(alphabet=st.characters(whitelist_categories=("Ll", "Nd")), max_size=20),
    ts=ts_st,
)
def test_5424_roundtrip(pri, host, prog, pid, msg, val, ts):
    spark = _get_spark()
    iso = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    raw = f'<{pri}>1 {iso} {host} {prog} {pid} MID7 [sd@0 k="{val}"] {msg}'
    row = syslog_parser_5424(spark.createDataFrame([(raw,)], "raw string")).collect()[0]
    assert row.facility == pri // 8 and row.severity == pri % 8
    assert row.host == host and row.program == prog and row.pid == pid
    assert row.msgid == "MID7"
    assert row.sdata["sd@0.k"] == val
    assert row.message == msg
    assert row.ts == ts


@settings(max_examples=12, deadline=None)
@given(
    k1=st.from_regex(r"[a-z]{1,8}", fullmatch=True),
    v1=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126, blacklist_characters='"'), max_size=20),
    v2=st.from_regex(r"[a-zA-Z0-9]{0,12}", fullmatch=True),
)
def test_kv_quoted_roundtrip(k1, v1, v2):
    spark = _get_spark()
    line = f'{k1}="{v1}" other={v2}'
    row = kv_parser_quoted(spark.createDataFrame([(line,)], "s string"), "s").collect()[0]
    assert row.kv[k1] == v1
    assert row.kv["other"] == v2


def test_kv_quoted_value_containing_equals():
    """Frozen hypothesis counterexample (round 4): a quoted value that
    contains '=' must not let the key regex backtrack into the opening
    quote. Input a="= " other= used to parse kv[a] as '=' (truncated)."""
    spark = _get_spark()
    cases = [
        ('a="= " other=', {"a": "= ", "other": ""}),
        ('k="x=y z=w" t=1', {"k": "x=y z=w", "t": "1"}),
        ('u="a = b" v="="', {"u": "a = b", "v": "="}),
    ]
    df = spark.createDataFrame([(line,) for line, _ in cases], "s string")
    rows = kv_parser_quoted(df, "s").collect()
    got = {r.s: dict(r.kv) for r in rows}
    for line, want in cases:
        assert got[line] == want, f"{line!r}: {got[line]} != {want}"
