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
