"""PROXY protocol (HAProxy v1) source transport.

Parity suite ported from the reference's criterion tests
(lib/logproto/tests/test-proxy-proto.c) plus scenario shapes from its
functional tests (tests/python_functional/.../proxyprotocol/):
header acceptance table, aux-data NV pairs, handshake-failure
connection drop, multiple clients, proxied payload through the
syslog parser.
"""
from __future__ import annotations

import socket
import threading
import time

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.sources.proxyproto import (
    ProxiedTcpBridge,
    parse_proxy_header,
    proxied_tcp_lines,
    proxied_text_messages,
)

# (header, valid) — ported row-for-row from test-proxy-proto.c
# ParameterizedTestParameters(log_proto, test_proxy_protocol_parse_header)
HEADER_TABLE = [
    # SUCCESS
    ("PROXY UNKNOWN\r\n", True),
    ("PROXY UNKNOWN extra ignored parameters\r\n", True),
    ("PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444\r\n", True),
    ("PROXY TCP6 ::1 ::2 3333 4444\r\n", True),
    # WRONG TERMINATION — still accepted
    ("PROXY UNKNOWN\n", True),
    ("PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444\n", True),
    ("PROXY UNKNOWN\r", True),
    ("PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444\r", True),
    # MISSING PARAMS
    ("PROXY\r\n", False),
    ("PROXY TCP4\r\n", False),
    ("PROXY TCP4 1.1.1.1\r\n", False),
    ("PROXY TCP4 1.1.1.1 2.2.2.2\r\n", False),
    ("PROXY TCP4 1.1.1.1 2.2.2.2 3333\r\n", False),
    ("PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444 extra param\r\n", True),
    # EXTRA WHITESPACE - PERMISSIVE
    ("PROXY TCP4  1.1.1.1 2.2.2.2 3333 4444\r\n", True),
    ("PROXY TCP4 1.1.1.1  2.2.2.2 3333 4444\r\n", True),
    ("PROXY TCP4 1.1.1.1 2.2.2.2  3333 4444\r\n", True),
    ("PROXY TCP4 1.1.1.1 2.2.2.2 3333  4444\r\n", True),
    ("PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444 \r\n", True),
    # EXTRA WHITESPACE BEFORE PARAMETERS
    ("PROXY  TCP4 1.1.1.1 2.2.2.2 3333 4444\r\n", False),
    # INVALID ARGUMENTS - PERMISSIVE
    ("PROXY TCP6 1.1.1.1 2.2.2.2 3333 4444\r\n", True),
    ("PROXY TCP4 ::1 ::2 3333 4444\r\n", True),
    ("PROXY TCP4 1.1.1 2.2.2.2 3333 4444\r\n", True),
    ("PROXY TCP4 1.1.1.1.1 2.2.2.2 3333 4444\r\n", True),
    ("PROXY TCP6 ::1::0 ::1 3333 4444\r\n", True),
    ("PROXY TCP4 1.1.1.1 2.2.2.2 33333 0\r\n", True),
    ("PROXY TCP4 1.1.1.1 2.2.2.2 33333 -1\r\n", True),
    ("PROXY TCP4 1.1.1.1 2.2.2.2 33333 65536\r\n", True),
    # INVALID ARGUMENT(S)
    ("PROXY TCP3 1.1.1.1 2.2.2.2 3333 4444\r\n", False),
    # TOO LONG (152 chars: fails on param count, not length)
    ("PROXY TCP4 " + "pad" * 47, False),
    # beyond PROXY_PROTO_HDR_MAX_LEN (216): hard length fail, even UNKNOWN
    ("PROXY UNKNOWN " + "x" * 220 + "\r\n", False),
]


@pytest.mark.parametrize("header,valid", HEADER_TABLE)
def test_parse_header_table(header, valid):
    got = parse_proxy_header(header)
    assert (got is not None) == valid, header


def test_parse_header_aux_values():
    info = parse_proxy_header("PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444\r\n")
    assert info == {
        "unknown": False, "ip_version": 4,
        "src_ip": "1.1.1.1", "dst_ip": "2.2.2.2",
        "src_port": 3333, "dst_port": 4444,
    }
    # atoi semantics on garbage ports; IPs verbatim (no validation)
    info = parse_proxy_header("PROXY TCP6 ::1::0 ::1 65536 -1\r\n")
    assert info["src_port"] == 65536 and info["dst_port"] == -1
    assert info["src_ip"] == "::1::0" and info["ip_version"] == 6
    assert parse_proxy_header("PROXY UNKNOWN\r\n") == {"unknown": True}


def _capture(header, msgs, conn="c0"):
    return [(conn, i, ln) for i, ln in enumerate([header] + list(msgs))]


def test_batch_operator_matches_python_parser(spark):
    """Differential: the Column implementation must agree with the
    Python reference parser on every criterion-table header — both
    on connection validity and on the five NV values."""
    rows = []
    for k, (header, _valid) in enumerate(HEADER_TABLE):
        rows += _capture(header.rstrip("\r\n"), ["payload"], conn=f"c{k:02d}")
    df = spark.createDataFrame(rows, "conn string, frame_no long, message string")
    out = {r["conn"]: r for r in proxied_text_messages(df).collect()}
    for k, (header, valid) in enumerate(HEADER_TABLE):
        conn = f"c{k:02d}"
        info = parse_proxy_header(header)
        assert (conn in out) == valid, header
        if not valid:
            continue
        row = out[conn]
        assert row["message"] == "payload"
        if info.get("unknown"):
            assert row["PROXIED_SRCIP"] is None
            assert row["PROXIED_IP_VERSION"] is None
        else:
            assert row["PROXIED_SRCIP"] == info["src_ip"]
            assert row["PROXIED_DSTIP"] == info["dst_ip"]
            assert row["PROXIED_SRCPORT"] == str(info["src_port"])
            assert row["PROXIED_DSTPORT"] == str(info["dst_port"])
            assert row["PROXIED_IP_VERSION"] == str(info["ip_version"])


def test_batch_operator_drops_whole_invalid_connection(spark):
    rows = _capture("invalid header", ["m1", "m2"], conn="bad") + \
        _capture("PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444", ["m1", "m2"], conn="ok")
    df = spark.createDataFrame(rows, "conn string, frame_no long, message string")
    got = proxied_text_messages(df).collect()
    assert sorted((r["conn"], r["message"]) for r in got) == [
        ("ok", "m1"), ("ok", "m2")]
    assert all(r["PROXIED_SRCIP"] == "1.1.1.1" for r in got)


def test_batch_operator_aux_concat_parity(spark):
    """The reference's test_proxy_protocol_aux_data expected string,
    reproduced from the frame columns."""
    rows = _capture("PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444", ["test message"])
    df = spark.createDataFrame(rows, "conn string, frame_no long, message string")
    r = proxied_text_messages(df).head()
    concat = (
        f"PROXIED_SRCIP:{r['PROXIED_SRCIP']} PROXIED_DSTIP:{r['PROXIED_DSTIP']} "
        f"PROXIED_SRCPORT:{r['PROXIED_SRCPORT']} "
        f"PROXIED_DSTPORT:{r['PROXIED_DSTPORT']} "
        f"PROXIED_IP_VERSION:{r['PROXIED_IP_VERSION']} "
    )
    assert concat == ("PROXIED_SRCIP:1.1.1.1 PROXIED_DSTIP:2.2.2.2 "
                      "PROXIED_SRCPORT:3333 PROXIED_DSTPORT:4444 "
                      "PROXIED_IP_VERSION:4 ")
    assert r["message"] == "test message"


def _drain_reader(bridge, want_lines, deadline_s=30):
    reader = socket.create_connection(("127.0.0.1", bridge.relay_port))
    reader.settimeout(deadline_s)
    buf = b""
    try:
        while buf.count(b"\n") < want_lines:
            chunk = reader.recv(65536)
            if not chunk:
                break
            buf += chunk
    except TimeoutError:
        pass
    finally:
        reader.close()
    return buf.decode().splitlines()


def test_bridge_handshake_and_annotation():
    bridge = ProxiedTcpBridge()
    try:
        c = socket.create_connection(("127.0.0.1", bridge.bind_port))
        c.sendall(b"PROXY TCP4 1.1.1.1 2.2.2.2 3333 4444\r\n")
        c.sendall(b"test message\n")
        c.sendall(b"second one\n")
        c.close()
        lines = _drain_reader(bridge, 2)
        assert lines == [
            "127.0.0.1 4 1.1.1.1 2.2.2.2 3333 4444 test message",
            "127.0.0.1 4 1.1.1.1 2.2.2.2 3333 4444 second one",
        ]
    finally:
        bridge.close()


def test_bridge_rejects_invalid_handshake():
    bridge = ProxiedTcpBridge()
    try:
        c = socket.create_connection(("127.0.0.1", bridge.bind_port))
        c.sendall(b"invalid header\r\nshould never arrive\n")
        deadline = time.time() + 20
        while bridge.handshakes_failed == 0 and time.time() < deadline:
            time.sleep(0.05)
        assert bridge.handshakes_failed == 1
        # the connection is closed server-side; nothing reaches readers
        assert _drain_reader(bridge, 1, deadline_s=2) == []
    finally:
        bridge.close()


def test_bridge_unknown_header_no_aux():
    bridge = ProxiedTcpBridge()
    try:
        c = socket.create_connection(("127.0.0.1", bridge.bind_port))
        c.sendall(b"PROXY UNKNOWN\r\nhello\n")
        c.close()
        lines = _drain_reader(bridge, 1)
        assert lines == ["127.0.0.1 - - - - - hello"]
    finally:
        bridge.close()


def test_proxied_tcp_lines_live_multiple_clients(spark):
    """Functional scenario (test_pp_with_multiple_clients.py shape):
    two concurrent proxied connections with different headers plus an
    UNKNOWN one; every message carries its own connection's
    endpoints, UNKNOWN rows carry NULLs."""
    df, bridge = proxied_tcp_lines(spark)
    q = (
        df.writeStream.format("memory")
        .queryName("proxied_smoke")
        .outputMode("append")
        .start()
    )

    def client(header, msgs):
        c = socket.create_connection(("127.0.0.1", bridge.bind_port))
        c.sendall(header.encode() + b"\r\n")
        for m in msgs:
            c.sendall(m.encode() + b"\n")
        time.sleep(1.0)
        c.close()

    try:
        t1 = threading.Thread(
            target=client,
            args=("PROXY TCP4 10.0.0.1 10.0.0.2 1111 514", ["from-a1", "from-a2"]),
        )
        t2 = threading.Thread(
            target=client,
            args=("PROXY TCP6 ::a ::b 2222 6514", ["from-b"]),
        )
        t3 = threading.Thread(
            target=client, args=("PROXY UNKNOWN", ["from-c"]))
        for t in (t1, t2, t3):
            t.start()
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            q.processAllAvailable()
            rows = spark.sql("select * from proxied_smoke").collect()
            if len(rows) >= 4:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        bridge.close()

    by_msg = {r["raw"]: r for r in rows}
    assert set(by_msg) == {"from-a1", "from-a2", "from-b", "from-c"}
    a = by_msg["from-a1"]
    assert (a["PROXIED_SRCIP"], a["PROXIED_DSTPORT"],
            a["PROXIED_IP_VERSION"]) == ("10.0.0.1", "514", "4")
    assert by_msg["from-a2"]["PROXIED_SRCIP"] == "10.0.0.1"
    b = by_msg["from-b"]
    assert (b["PROXIED_SRCIP"], b["PROXIED_DSTIP"],
            b["PROXIED_IP_VERSION"]) == ("::a", "::b", "6")
    c = by_msg["from-c"]
    assert c["PROXIED_SRCIP"] is None and c["PROXIED_IP_VERSION"] is None
    assert all(r["peer"] == "127.0.0.1" for r in rows)


def test_proxied_payload_through_syslog_parser(spark):
    """test_pp_with_syslog_proto.py shape: the proxied payload is a
    syslog frame; source-level parsing applies to `raw` exactly as on
    a plain tcp transport, and the PROXIED_* columns ride along."""
    from syslog_ng_spark.operators.parsers import syslog_parser_3164

    rows = _capture(
        "PROXY TCP4 198.51.100.7 10.0.0.2 4242 514",
        ["<11>Jan  5 03:04:05 web-01 app[77]: disk err A"],
    )
    df = spark.createDataFrame(rows, "conn string, frame_no long, message string")
    out = proxied_text_messages(df).withColumnRenamed("message", "raw")
    parsed = syslog_parser_3164(out, year=2024).head()
    assert parsed["host"] == "web-01" and parsed["severity"] == 3
    assert parsed["PROXIED_SRCIP"] == "198.51.100.7"
    assert parsed["PROXIED_SRCPORT"] == "4242"


# ---------------------------------------------------------------------------
# conf front-end: transport(proxied-tcp) / transport(proxied-tls)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tls_cert(tmp_path_factory):
    import shutil
    import subprocess

    if shutil.which("openssl") is None:
        pytest.skip("no openssl binary")
    d = tmp_path_factory.mktemp("pp_tls")
    cert, key = d / "cert.pem", d / "key.pem"
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
            "-keyout", str(key), "-out", str(cert), "-days", "2",
            "-subj", "/CN=localhost",
            "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1",
        ],
        check=True,
        capture_output=True,
    )
    return str(cert), str(key)


def test_conf_compiles_proxied_transport():
    from syslog_ng_spark.config import compile_conf, parse_conf

    text = """
source s { network(ip(127.0.0.1) port(5555) transport("proxied-tcp")); };
destination d { file("/tmp/x"); };
log { source(s); destination(d); };
"""
    p = compile_conf(parse_conf(text))[0]
    assert p["source"]["proxied"] is True
    assert "tls" not in p["source"]

    text_tls = text.replace(
        'transport("proxied-tcp")',
        'transport("proxied-tls") tls(cert-file("/c") key-file("/k"))')
    p = compile_conf(parse_conf(text_tls))[0]
    assert p["source"]["proxied"] is True
    assert p["source"]["tls"] == {"cert_file": "/c", "key_file": "/k"}


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _poll_output(spark, outdir, want, deadline_s=90):
    deadline = time.time() + deadline_s
    got: list = []
    while time.time() < deadline:
        try:
            got = sorted({r["value"] for r in spark.read.text(str(outdir)).collect()})
        except Exception:
            got = []
        if got == want:
            break
        time.sleep(0.5)
    return got


def test_run_conf_stream_proxied_tcp_e2e(spark, tmp_path):
    """Daemon-mode functional test (test_pp_acceptance.py shape): a
    proxied-tcp network() source behind a 'load balancer' client; the
    destination template renders the PROXIED_* NVs per message."""
    from syslog_ng_spark.config import _ACTIVE_UDP_BRIDGES, run_conf_stream

    port = _free_port()
    outdir, ckpt = tmp_path / "out", tmp_path / "ckpt"
    text = f"""
source s {{ network(ip(127.0.0.1) port({port}) transport("proxied-tcp")
                    flags(no-parse)); }};
destination d {{ file("{outdir}"
    template("$PROXIED_SRCIP:$PROXIED_SRCPORT v$PROXIED_IP_VERSION $MSG")); }};
log {{ source(s); destination(d); }};
"""
    queries = run_conf_stream(spark, text, str(ckpt))
    bridge = _ACTIVE_UDP_BRIDGES[-1]
    try:
        c = socket.create_connection(("127.0.0.1", bridge.bind_port))
        c.sendall(b"PROXY TCP4 203.0.113.9 10.0.0.1 33000 514\r\n")
        c.sendall(b"hello one\nhello two\n")
        time.sleep(0.5)
        c.close()
        want = sorted([
            "203.0.113.9:33000 v4 hello one",
            "203.0.113.9:33000 v4 hello two",
        ])
        got = _poll_output(spark, outdir, want)
        assert got == want
    finally:
        for q in queries:
            q.stop()
        bridge.close()


def test_run_conf_stream_proxied_tls_e2e(spark, tmp_path, tls_cert):
    """test_pp_tls.py shape: proxied-tls terminates TLS at the source,
    then expects the PROXY header as the first decrypted line."""
    import ssl

    from syslog_ng_spark.config import _ACTIVE_UDP_BRIDGES, run_conf_stream

    cert, key = tls_cert
    port = _free_port()
    outdir, ckpt = tmp_path / "out", tmp_path / "ckpt"
    text = f"""
source s {{ network(ip(127.0.0.1) port({port}) transport("proxied-tls")
    tls(cert-file("{cert}") key-file("{key}") peer-verify(optional-untrusted))
    flags(no-parse)); }};
destination d {{ file("{outdir}" template("$PROXIED_SRCIP $MSG")); }};
log {{ source(s); destination(d); }};
"""
    queries = run_conf_stream(spark, text, str(ckpt))
    bridge = _ACTIVE_UDP_BRIDGES[-1]
    try:
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        raw_sock = socket.create_connection(("127.0.0.1", bridge.bind_port))
        c = ctx.wrap_socket(raw_sock, server_hostname="localhost")
        c.sendall(b"PROXY TCP6 2001:db8::1 2001:db8::2 4000 6514\r\n")
        c.sendall(b"tls payload\n")
        time.sleep(0.5)
        c.close()
        got = _poll_output(spark, outdir, ["2001:db8::1 tls payload"])
        assert got == ["2001:db8::1 tls payload"]
    finally:
        for q in queries:
            q.stop()
        bridge.close()


def test_bridge_verbatim_dash_params_escaped_in_relay():
    """The reference stores TCP4/TCP6 params VERBATIM — no validation
    (logproto-proxied-text-server.c:117-121) — so a degenerate-but-
    legal `PROXY TCP4 - - 1 2` handshake must keep its literal "-"
    values through the bridge. The relay frame escapes them as %2D
    (bare "-" stays the UNKNOWN placeholder)."""
    bridge = ProxiedTcpBridge()
    try:
        c = socket.create_connection(("127.0.0.1", bridge.bind_port))
        c.sendall(b"PROXY TCP4 - - 1 2\r\nhello\n")
        c.close()
        lines = _drain_reader(bridge, 1)
        assert lines == ["127.0.0.1 4 %2D %2D 1 2 hello"]
    finally:
        bridge.close()


def test_proxied_tcp_lines_verbatim_dash_round_trip(spark):
    """End-to-end: the reader decodes %2D back to a literal "-" NV
    value, while PROXY UNKNOWN rows still map to NULL."""
    df, bridge = proxied_tcp_lines(spark)
    q = (
        df.writeStream.format("memory")
        .queryName("proxied_dash")
        .outputMode("append")
        .start()
    )
    try:
        c = socket.create_connection(("127.0.0.1", bridge.bind_port))
        c.sendall(b"PROXY TCP4 - - 1 2\r\ndash-msg\n")
        time.sleep(0.5)
        c.close()
        u = socket.create_connection(("127.0.0.1", bridge.bind_port))
        u.sendall(b"PROXY UNKNOWN\r\nunk-msg\n")
        time.sleep(0.5)
        u.close()
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            q.processAllAvailable()
            rows = spark.sql("select * from proxied_dash").collect()
            if len(rows) >= 2:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        bridge.close()
    by_msg = {r["raw"]: r for r in rows}
    assert set(by_msg) == {"dash-msg", "unk-msg"}
    d = by_msg["dash-msg"]
    assert d["PROXIED_SRCIP"] == "-" and d["PROXIED_DSTIP"] == "-"
    assert d["PROXIED_SRCPORT"] == "1" and d["PROXIED_DSTPORT"] == "2"
    u = by_msg["unk-msg"]
    assert u["PROXIED_SRCIP"] is None and u["PROXIED_IP_VERSION"] is None
