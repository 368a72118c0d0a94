"""SCL application parsers — corpora straight from the reference's
documented examples (scl/apache/apache.conf header comments,
IOS-style cisco lines, netfilter kernel lines)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from syslog_ng_spark.operators.app_parsers import (
    apache_accesslog_parser,
    cisco_parser,
    detect_app,
    ewmm_parser,
    iptables_parser,
    sudo_parser,
)


def test_apache_all_four_documented_formats(spark):
    lines = [
        'virtualhost:443 127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /apache_pb.gif HTTP/1.0" 200 2326 '
        '"http://www.example.com/start.html" "Mozilla/4.08 [en] (Win98; I ;Nav)"',
        'virtualhost:443 127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /apache_pb.gif HTTP/1.0" 200 2326',
        '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /apache_pb.gif HTTP/1.0" 200 2326 '
        '"http://www.example.com/start.html" "Mozilla/4.08 [en] (Win98; I ;Nav)"',
        '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] '
        '"GET /apache_pb.gif HTTP/1.0" 200 -',
    ]
    df = spark.createDataFrame([(line,) for line in lines], "message string")
    rows = apache_accesslog_parser(df, "message").collect()
    for r in rows:
        assert r.apache_clientip == "127.0.0.1"
        assert r.apache_ident == "-"  # '-' is a literal column value in the csv schema
    rows = {
        (r.apache_vhost, r.apache_referrer is not None, r.apache_bytes): r for r in rows
    }
    vc = rows[("virtualhost", True, 2326)]
    assert vc.apache_port == 443 and vc.apache_auth == "frank"
    assert vc.apache_verb == "GET" and vc.apache_request == "/apache_pb.gif"
    assert vc.apache_httpversion == "1.0" and vc.apache_response == 200
    assert vc.apache_agent.startswith("Mozilla/4.08")
    # -0700 offset -> 20:55:36 UTC
    assert vc.apache_ts == datetime.datetime(2000, 10, 10, 20, 55, 36)
    assert ("virtualhost", False, 2326) in rows  # vhost_common
    plain_dash = rows[(None, False, None)]  # common with '-' bytes
    assert plain_dash.apache_response == 200 and plain_dash.apache_bytes is None


def test_apache_ident_is_literal_dash(spark):
    df = spark.createDataFrame(
        [('127.0.0.1 ident42 frank [10/Oct/2000:13:55:36 -0700] "GET / HTTP/1.0" 200 1',)],
        "message string",
    )
    r = apache_accesslog_parser(df, "message").collect()[0]
    assert r.apache_ident == "ident42"


def test_apache_nonmatching_line_yields_nulls(spark):
    df = spark.createDataFrame([("not an access log",)], "message string")
    r = apache_accesslog_parser(df, "message").collect()[0]
    assert r.apache_response is None and r.apache_clientip is None


def test_cisco_parser_forms(spark):
    lines = [
        "<189>123: *Mar  1 18:46:11.299: %SYS-5-CONFIG_I: Configured from console by vty2",
        "%LINK-3-UPDOWN: Interface FastEthernet0/1, changed state to down",
        "<190>Jan  5 2024 03:04:05: %SEC-6-IPACCESSLOGP: list 102 denied tcp",
        "<134>456: Feb 14 11:22:33 UTC: %FW-SESSION-6-SESS_AUDIT_TRAIL: Start tcp session",
    ]
    df = spark.createDataFrame([(line,) for line in lines], "raw string")
    rows = {r.cisco_mnemonic: r for r in cisco_parser(df, "raw").collect()}
    a = rows["CONFIG_I"]
    assert a.cisco_pri == 189 and a.cisco_facility_num == 23 and a.cisco_severity_num == 5
    assert a.cisco_seqno == 123 and a.cisco_facility == "SYS" and a.cisco_severity == 5
    assert a.cisco_ts.month == 3 and a.cisco_ts.second == 11
    b = rows["UPDOWN"]  # bare triplet, no pri/seq/ts
    assert b.cisco_pri is None and b.cisco_ts is None and b.cisco_facility == "LINK"
    c = rows["IPACCESSLOGP"]
    assert c.cisco_ts == datetime.datetime(2024, 1, 5, 3, 4, 5)
    d = rows["SESS_AUDIT_TRAIL"]  # 4-part triplet + tz abbrev in ts
    assert d.cisco_facility == "FW-SESSION" and d.cisco_severity == 6
    assert d.cisco_message == "Start tcp session"


def test_iptables_parser_strays_and_empty_values(spark):
    df = spark.createDataFrame(
        [
            (
                "IN=eth0 OUT= MAC=00:11:22 SRC=192.168.1.2 DST=10.0.0.1 LEN=60 "
                "PROTO=TCP SPT=51812 DPT=22 WINDOW=64240 SYN URGP=0",
            )
        ],
        "message string",
    )
    sd = dict(iptables_parser(df, "message").collect()[0].sdata)
    assert sd[".iptables.IN"] == "eth0"
    assert sd[".iptables.OUT"] == ""  # empty value survives
    assert sd[".iptables.SRC"] == "192.168.1.2"
    assert sd[".iptables.SPT"] == "51812"
    assert ".iptables.SYN" not in sd  # flag word = stray, skipped


def test_sudo_parser_strays_and_command_filter(spark):
    df = spark.createDataFrame(
        [
            ("   alice : TTY=pts/0 ; PWD=/home/alice ; USER=root ; COMMAND=/bin/ls -l /tmp",),
            ("pam_unix(sudo:session): session opened for user root",),
        ],
        "message string",
    )
    rows = sudo_parser(df, "message").collect()
    assert len(rows) == 1  # pam noise dropped (no COMMAND)
    sd = dict(rows[0].sdata)
    assert sd[".sudo.SUBJECT"] == "alice"
    assert sd[".sudo.TTY"] == "pts/0"
    assert sd[".sudo.COMMAND"] == "/bin/ls -l /tmp"  # inner spaces kept


def test_ewmm_parser_roundtrip_and_hop_by_hop(spark):
    df = spark.createDataFrame(
        [
            (
                "@syslog-ng",
                '{"MESSAGE":"real msg","HOST":"web-01","PROGRAM":"nginx",'
                '".custom.k":"v","._TAGS":"a,b"}',
            ),
            ("other", "plain text"),
        ],
        "program string, message string",
    )
    rows = {r.program: r for r in ewmm_parser(df).collect()}
    e = rows["@syslog-ng"]
    assert e.is_ewmm and e.ewmm_message == "real msg" and e.ewmm_host == "web-01"
    assert e.ewmm_program == "nginx" and e.ewmm_tags == ["a", "b"]
    assert dict(e.ewmm_sdata) == {".custom.k": "v"}  # ._TAGS consumed
    assert not rows["other"].is_ewmm and rows["other"].ewmm_message is None


def test_detect_app_first_match_rules(spark):
    df = spark.createDataFrame(
        [
            ("kernel", "IN=eth0 OUT= PROTO=TCP SPT=1"),
            ("sudo", "x : COMMAND=/bin/true"),
            ("@syslog-ng", "{}"),
            ("cron", "%SYS-5-CONFIG_I: done"),
            ("httpd", '1.2.3.4 - u [10/Oct/2000:13:55:36 -0700] "GET / HTTP/1.0" 200 5'),
            ("cron", "job ran"),
        ],
        "program string, message string",
    )
    got = [r.app for r in detect_app(df).collect()]
    assert got == ["iptables", "sudo", "ewmm", "cisco", "apache", "unknown"]


def test_fortigate_parser_kv_and_date(spark):
    from syslog_ng_spark.operators.app_parsers import fortigate_parser

    df = spark.createDataFrame(
        [
            ('date=2024-01-05 time=03:04:05 devname="FG100" level=warning msg="intrusion detected"',),
            ("unrelated line",),
        ],
        "message string",
    )
    rows = fortigate_parser(df).collect()
    fg = [r for r in rows if r.is_fortigate][0]
    assert fg.sdata[".fortigate.devname"] == "FG100"
    assert fg.sdata[".fortigate.msg"] == "intrusion detected"
    assert str(fg.fortigate_ts) == "2024-01-05 03:04:05"
    assert sum(1 for r in rows if r.is_fortigate) == 1


def test_checkpoint_parser_colon_semicolon_kv(spark):
    from syslog_ng_spark.operators.app_parsers import checkpoint_parser

    df = spark.createDataFrame(
        [("time:1577000000; product:VPN-1 & FireWall-1; action:Drop; src:1.2.3.4",)],
        "message string",
    )
    sd = dict(checkpoint_parser(df).collect()[0].sdata)
    assert sd[".checkpoint.product"] == "VPN-1 & FireWall-1"  # spaces kept
    assert sd[".checkpoint.action"] == "Drop"
    assert sd[".checkpoint.src"] == "1.2.3.4"


def test_osquery_parser_json_prefix(spark):
    from syslog_ng_spark.operators.app_parsers import osquery_parser

    df = spark.createDataFrame(
        [('{"name":"pack_proc","columns":{"pid":"42"}}',)], "message string"
    )
    sd = dict(osquery_parser(df).collect()[0].sdata)
    assert sd[".osquery.name"] == "pack_proc"
    assert sd[".osquery.columns"] == '{"pid":"42"}'  # nested keeps JSON rendering


def test_panos_parser_type_dispatch(spark):
    from syslog_ng_spark.operators.app_parsers import panos_parser

    lines = [
        "1,2024/01/05 03:04:05,001122,SYSTEM,general,x,2024/01/05 03:04:05,"
        "vsys1,general-ev,obj,a,b,general,informational,desc text,1234,0x0,"
        "1,2,3,4,vs1,fw-edge-01",
        "1,2024/01/05 03:04:05,001122,TRAFFIC,end,x,2024/01/05 03:04:05,"
        "10.1.1.2,8.8.8.8,0.0.0.0,0.0.0.0,allow-dns,u1,,dns,vsys1,trust,"
        "untrust,ae1,ae2,fwd,x,5555,1,53211,53,0,0,0x0,udp,allow,120,60,60,2,"
        "2024/01/05 03:03:00,5,any,x,77,0x0,US,US,x,1,1,aged-out,1,2,3,4,vs1,"
        "fw-edge-01",
        "weird,line",
    ]
    df = spark.createDataFrame([(line,) for line in lines], "message string")
    rows = [dict(r.sdata) for r in panos_parser(df).collect()]
    sys_row = next(r for r in rows if r.get(".panos.type") == "SYSTEM")
    assert sys_row[".panos.eventid"] == "general-ev"
    assert sys_row[".panos.severity"] == "informational"
    assert sys_row[".panos.device_name"] == "fw-edge-01"
    tr = next(r for r in rows if r.get(".panos.type") == "TRAFFIC")
    assert tr[".panos.src"] == "10.1.1.2" and tr[".panos.dport"] == "53"
    assert tr[".panos.session_end_reason"] == "aged-out"
    short = next(r for r in rows if r.get(".panos.type") is None)
    assert len(short) == 2  # only the two header fields the line has
