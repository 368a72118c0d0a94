"""Macro-registry conformance: every name in the reference's macro
table (lib/template/macros.c macros[]) must resolve through the
template compiler — to its implemented semantics, or to the documented
unset/NV-fallback class for per-delivery eval state the batch model
doesn't carry (SEQNUM = per-destination counter, RCPTID/UNIQID =
persist-file ids, CONTEXT_ID outside a correlation scope).
"""

from __future__ import annotations

import datetime as dt
import re

import pytest

from syslog_ng_spark.template import MACROS, compile_template

MACROS_C = "/root/reference/lib/template/macros.c"

# eval-option / socket state: renders '' without that state in the
# reference too — resolved via the NV fallback here (setting the
# value in sdata binds them). SEQNUM/RCPTID/UNIQID left this class in
# r11: operators/delivery.py assigns the columns and the resolver
# binds them (they render '' only when the state is absent, exactly
# like seq_num/rcptid of 0 in the reference).
UNSET_CLASS = {"CONTEXT_ID", "_",
               "SOURCEIP", "DESTIP", "DESTPORT", "PROTO"}


def _reference_macro_names() -> list[str]:
    names = re.findall(r'\{ "([A-Z0-9_]+|_)"', open(MACROS_C).read())
    assert len(names) >= 160  # the table ships ~164 names
    return sorted(set(names))


@pytest.fixture(scope="module")
def msg(spark):
    row = {
        "ts": dt.datetime(2006, 2, 11, 10, 34, 56, 123456),
        "host": "bzorp",
        "program": "syslog-ng",
        "pid": 23323,
        "facility": 19,
        "severity": 3,
        "message": "error message",
        "sdata": {".SDATA.meta.sequenceId": "7", ".SDATA.meta.sysUpTime": "5"},
        "tags": ["alma"],
        "seqnum": 5,
        "rcptid": 255,
    }
    return spark.createDataFrame(
        [row],
        "ts timestamp, host string, program string, pid int, facility int, "
        "severity int, message string, sdata map<string,string>, tags array<string>, "
        "seqnum long, rcptid long",
    )


def test_every_reference_macro_resolves(msg):
    """One SELECT over all ~164 macros: compiles, analyzes, executes."""
    names = _reference_macro_names()
    cols = {n: compile_template(f"${{{n}}}", msg).alias(f"m{i}")
            for i, n in enumerate(names)}
    row = msg.select(*cols.values()).collect()[0]
    vals = dict(zip(names, row))
    missing_semantics = [
        n for n in names
        if n not in MACROS and n not in UNSET_CLASS and vals[n] == ""
    ]
    assert not missing_semantics, (
        f"reference macros rendering unset without being in the documented"
        f" unset class: {missing_semantics}"
    )


def test_macro_values(msg):
    """Spot semantics for the r10 additions (macros.c cases cited)."""
    def r(t):
        return msg.select(compile_template(t, msg).alias("v")).collect()[0].v

    assert r("$TAG") == "9b"          # M_TAG: pri 155 as 2-pad hex
    assert r("$BSDTAG") == "3T"       # M_BSDTAG: sev digit + 'A'+facility
    assert r("$MSEC") == "123"        # M_MSEC: usec/1000, 3-pad
    assert r("$USEC") == "123456"     # M_USEC: 6-pad
    assert r("$ISOWEEK") == "06"      # ISO week of 2006-02-11
    assert r("$HOUR12") == "10" and r("$AMPM") == "AM"
    assert r("$S_ISODATE") == r("$ISODATE") == "2006-02-11T10:34:56+00:00"
    assert r("$R_MSEC") == "123"
    # C_*/P_* bind the evaluation-time clock: the year is this run's
    assert int(r("$C_YEAR")) >= 2026 and r("$P_YEAR") == r("$C_YEAR")
    # M_MONTH_WEEK for 2006-02-11 (mday 11, wday 6=Sat):
    # 11/7 + (6>0 && 11%7>=6) = 1 + 0
    assert r("$MONTH_WEEK") == "1"
    assert r("$SDATA") == '[meta sequenceId="7" sysUpTime="5"]'
    assert r("$LOGHOST") != ""
    assert re.fullmatch(r"[0-9a-f]{8}", r("$HOSTID"))
    assert r("$RUNID").startswith("local-")
    assert int(r("$SYSUPTIME")) > 0
    # per-delivery state (operators/delivery.py assigns the columns):
    # M_SEQNUM decimal, M_RCPTID decimal, M_UNIQID hostid@%016x-hex
    assert r("$SEQNUM") == "5" and r("$RCPTID") == "255"
    assert re.fullmatch(r"[0-9a-f]{8}@00000000000000ff", r("$UNIQID"))


def test_sdata_block_empty_renders_dash(spark):
    df = spark.createDataFrame(
        [({"plain": "x"},)], "sdata map<string,string>"
    )
    v = df.select(compile_template("$SDATA", df).alias("v")).collect()[0].v
    assert v == "-"


def test_connection_macros_bind_when_present(spark):
    df = spark.createDataFrame(
        [("10.0.0.9", "10.0.0.1", 514, 6)],
        "ip string, destip string, destport int, proto int",
    )
    v = df.select(
        compile_template("$SOURCEIP>$DESTIP:$DESTPORT/$PROTO", df).alias("v")
    ).collect()[0].v
    assert v == "10.0.0.9>10.0.0.1:514/6"
