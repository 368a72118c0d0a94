"""network()/network-load-balancer() destination e2e against live TCP
servers.

Mirrors the reference's afsocket destination semantics (modules/
afsocket/afsocket-dest.c: line-oriented TCP, reconnect-and-resend) and
the loadbalancer SCL (scl/loadbalancer/gen-loadbalancer.sh: each
message modulo-routed to exactly one network() target) over the real
wire path: Spark partitions -> per-partition sockets -> threaded
accept loops.
"""

from __future__ import annotations

import socket
import socketserver
import time
import sys
import threading

import pytest

from pyspark import cloudpickle

from syslog_ng_spark.sinks import NetworkDestination, network_load_balancer
from syslog_ng_spark.sources.framing import split_frames

cloudpickle.register_pickle_by_value(sys.modules[__name__])


class _LineCollector:
    def __init__(self):
        self.chunks: list[bytes] = []
        self.lock = threading.Lock()


def _make_server(collector: _LineCollector):
    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            buf = b""
            while True:
                data = self.request.recv(65536)
                if not data:
                    break
                buf += data
            with collector.lock:
                collector.chunks.append(buf)

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


@pytest.fixture()
def collectors():
    made = []

    def make():
        c = _LineCollector()
        srv, port = _make_server(c)
        made.append((srv, c))
        return c, port

    yield make
    for srv, _ in made:
        srv.shutdown()
        srv.server_close()


def _lines(collector: _LineCollector) -> list[str]:
    out = []
    with collector.lock:
        for chunk in collector.chunks:
            out.extend(l for l in chunk.decode("utf-8").split("\n") if l)
    return out


def test_network_sink_delivers_all_lines(spark, collectors):
    c, port = collectors()
    df = spark.range(200).selectExpr("concat('msg-', id) AS message").repartition(4)
    dest = NetworkDestination(targets=[("127.0.0.1", port)], template="$MESSAGE")
    stats = dest.write(df)
    assert stats["delivered"] == 200
    got = _lines(c)
    assert sorted(got) == sorted(f"msg-{i}" for i in range(200))


def test_network_sink_octet_counted_round_trips(spark, collectors):
    """RFC6587 framing on the wire decodes with the repo's own frame
    splitter — sender and receiver agree on the spec."""
    c, port = collectors()
    df = spark.range(50).selectExpr("concat('payload with spaces ', id) AS message")
    dest = NetworkDestination(
        targets=[("127.0.0.1", port)], template="$MESSAGE", framing="octet-counted"
    )
    stats = dest.write(df)
    assert stats["delivered"] == 50
    with c.lock:
        raw = b"".join(c.chunks).decode("utf-8")
    msgs = split_frames(raw)
    assert sorted(msgs) == sorted(f"payload with spaces {i}" for i in range(50))


def test_load_balancer_spreads_and_loses_nothing(spark, collectors):
    """gen-loadbalancer.sh semantics: every message to exactly one
    target, spread roughly uniformly."""
    c1, p1 = collectors()
    c2, p2 = collectors()
    df = spark.range(400).selectExpr("concat('m', id) AS message").repartition(8)
    dest = network_load_balancer([f"127.0.0.1:{p1}", f"127.0.0.1:{p2}"], template="$MESSAGE")
    stats = dest.write(df)
    assert stats["delivered"] == 400
    g1, g2 = _lines(c1), _lines(c2)
    assert sorted(g1 + g2) == sorted(f"m{i}" for i in range(400))
    # modulo routing inside each partition -> near-even split
    assert min(len(g1), len(g2)) >= 120


def test_load_balancer_fails_over_to_live_target(spark, collectors):
    """One dead target: the ring walk reconnects to the live one and
    every message still lands (afsocket's reconnect-resend path)."""
    c, port = collectors()
    # grab a port with no listener
    probe = socket.socket()
    probe.bind(("127.0.0.1", 0))
    dead_port = probe.getsockname()[1]
    probe.close()
    df = spark.range(100).selectExpr("concat('f', id) AS message").repartition(2)
    dest = network_load_balancer(
        [f"127.0.0.1:{dead_port}", f"127.0.0.1:{port}"],
        template="$MESSAGE",
        retry_backoff=0.01,
    )
    stats = dest.write(df)
    assert stats["delivered"] == 100
    assert sorted(_lines(c)) == sorted(f"f{i}" for i in range(100))
    assert stats["reconnects"] > 0


# ---------------------------------------------------------------------------
# transport(tls) — lib/transport/transport-tls.c analog over stdlib ssl
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tls_cert(tmp_path_factory):
    """Self-signed localhost cert via the openssl CLI (no cryptography
    package needed)."""
    import shutil
    import subprocess

    if shutil.which("openssl") is None:
        pytest.skip("no openssl binary")
    d = tmp_path_factory.mktemp("tls")
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


def _make_tls_server(collector: _LineCollector, cert: str, key: str):
    import ssl

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert, key)

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            buf = b""
            try:
                while True:
                    data = self.request.recv(65536)
                    if not data:
                        break
                    buf += data
            except ssl.SSLError:
                pass  # handshake-rejected probe connections
            if buf:
                with collector.lock:
                    collector.chunks.append(buf)

    class TlsServer(socketserver.ThreadingTCPServer):
        def get_request(self):
            sock, addr = super().get_request()
            return ctx.wrap_socket(sock, server_side=True), addr

        def handle_error(self, request, client_address):
            pass  # failed handshakes are expected in the negative test

    srv = TlsServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


def test_tls_network_sink_round_trip(spark, tls_cert):
    """network(transport(tls) tls(ca-file peer-verify(required-trusted)))
    e2e against a live TLS server: every line delivered over an
    encrypted channel, trust anchored at the test CA."""
    from syslog_ng_spark.sinks import TlsOptions

    cert, key = tls_cert
    c = _LineCollector()
    srv, port = _make_tls_server(c, cert, key)
    try:
        df = spark.createDataFrame(
            [(i, f"tls message {i}") for i in range(40)], "i long, message string"
        ).repartition(4)
        dest = NetworkDestination(
            targets=[("localhost", port)],
            template="$MESSAGE",
            tls=TlsOptions(ca_file=cert, peer_verify="required-trusted"),
        )
        stats = dest.write(df)
        assert stats["delivered"] == 40
        deadline = time.time() + 10
        want = sorted(f"tls message {i}" for i in range(40))
        while sorted(_lines(c)) != want and time.time() < deadline:
            time.sleep(0.1)  # server handler threads flush after EOF
        assert sorted(_lines(c)) == want
    finally:
        srv.shutdown()
        srv.server_close()


def test_tls_required_trusted_rejects_unknown_ca(spark, tls_cert, tmp_path):
    """peer-verify(required-trusted) against a server whose cert is NOT
    in the trust store must refuse delivery (fail closed)."""
    import subprocess

    from syslog_ng_spark.sinks import TlsOptions

    cert, key = tls_cert
    # a different self-signed CA as the (wrong) trust anchor
    other = tmp_path / "other.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(tmp_path / "ok.pem"), "-out", str(other),
         "-days", "2", "-subj", "/CN=other"],
        check=True, capture_output=True,
    )
    c = _LineCollector()
    srv, port = _make_tls_server(c, cert, key)
    try:
        df = spark.createDataFrame([(1, "secret")], "i long, message string")
        dest = NetworkDestination(
            targets=[("localhost", port)],
            template="$MESSAGE",
            max_retries=1,
            tls=TlsOptions(ca_file=str(other), peer_verify="required-trusted"),
        )
        with pytest.raises(Exception):
            dest.write(df)
        assert _lines(c) == []  # nothing leaked in the clear or otherwise
    finally:
        srv.shutdown()
        srv.server_close()


def test_tls_optional_untrusted_encrypts_without_authentication(spark, tls_cert):
    """peer-verify(optional-untrusted): the reference's explicitly
    unauthenticated mode — delivery succeeds with no trust store."""
    from syslog_ng_spark.sinks import TlsOptions

    cert, key = tls_cert
    c = _LineCollector()
    srv, port = _make_tls_server(c, cert, key)
    try:
        df = spark.createDataFrame([(1, "hello-untrusted")], "i long, message string")
        dest = NetworkDestination(
            targets=[("localhost", port)],
            template="$MESSAGE",
            tls=TlsOptions(peer_verify="optional-untrusted"),
        )
        assert dest.write(df)["delivered"] == 1
        assert _lines(c) == ["hello-untrusted"]
    finally:
        srv.shutdown()
        srv.server_close()


def test_tls_options_validation():
    from syslog_ng_spark.sinks import TlsOptions

    with pytest.raises(ValueError, match="peer_verify"):
        TlsOptions(peer_verify="sometimes")
    with pytest.raises(ValueError, match="together"):
        TlsOptions(cert_file="c.pem")


def test_tls_trusted_modes_verify_hostname_by_default():
    """tls_verify_certificate_name (afinet-dest.c): the trusted modes
    check the cert name against the target host ALWAYS — check_hostname
    must be on even when sni isn't set (CWE-297 regression guard)."""
    from syslog_ng_spark.sinks import TlsOptions

    assert TlsOptions(peer_verify="required-trusted").client_context().check_hostname
    assert TlsOptions(peer_verify="optional-trusted").client_context().check_hostname
    # explicit opt-out flag — never the default
    ctx = TlsOptions(
        peer_verify="required-trusted", verify_hostname=False
    ).client_context()
    assert not ctx.check_hostname
    # untrusted modes don't verify anything (CERT_NONE)
    assert not TlsOptions(peer_verify="optional-untrusted").client_context().check_hostname


def test_tls_trusted_rejects_wrong_hostname_cert(spark, tls_cert, tmp_path):
    """MITM shape: the server presents a cert signed by a CA we DO
    trust, but issued for a different host. required-trusted must
    refuse delivery — trust-store membership alone is not enough."""
    import subprocess

    from syslog_ng_spark.sinks import TlsOptions

    wrong_cert = tmp_path / "wrong-host.pem"
    wrong_key = tmp_path / "wrong-host-key.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(wrong_key), "-out", str(wrong_cert),
         "-days", "2", "-subj", "/CN=attacker.example",
         "-addext", "subjectAltName=DNS:attacker.example"],
        check=True, capture_output=True,
    )
    c = _LineCollector()
    srv, port = _make_tls_server(c, str(wrong_cert), str(wrong_key))
    try:
        df = spark.createDataFrame([(1, "secret")], "i long, message string")
        dest = NetworkDestination(
            targets=[("localhost", port)],
            template="$MESSAGE",
            max_retries=1,
            # the wrong-host cert itself is the trust anchor: CA trust
            # passes, hostname verification is the only thing standing
            tls=TlsOptions(ca_file=str(wrong_cert), peer_verify="required-trusted"),
        )
        with pytest.raises(Exception):
            dest.write(df)
        assert _lines(c) == []
        # the documented opt-out reproduces the old behavior
        dest_optout = NetworkDestination(
            targets=[("localhost", port)],
            template="$MESSAGE",
            tls=TlsOptions(
                ca_file=str(wrong_cert),
                peer_verify="required-trusted",
                verify_hostname=False,
            ),
        )
        assert dest_optout.write(df)["delivered"] == 1
    finally:
        srv.shutdown()
        srv.server_close()
