"""http() destination end-to-end against a local stdlib http.server.

Mirrors the reference's own test surface (modules/http/tests/
test_http.c: status→verdict mapping; test_http-loadbalancer.c:
target failover) but exercises the real wire path: Spark partitions →
batched POST bodies → scripted response codes.
"""

from __future__ import annotations

import tempfile
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from syslog_ng_spark.sinks import HttpDestination, KvStoreDestination, default_http_action

# the KV client factory closes over classes defined in THIS module,
# which executors cannot import (tests/ is not on the worker path) —
# ship it by value instead of by reference
from pyspark import cloudpickle
import sys

cloudpickle.register_pickle_by_value(sys.modules[__name__])


class _Recorder:
    """Collects request bodies; serves status codes from a script
    (popped per request), defaulting to 200."""

    def __init__(self):
        self.bodies: list[str] = []
        self.lock = threading.Lock()
        self.script: list[int] = []

    def next_status(self) -> int:
        with self.lock:
            return self.script.pop(0) if self.script else 200


def _make_server(recorder: _Recorder):
    class Handler(BaseHTTPRequestHandler):
        def _handle(self):
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length).decode("utf-8")
            status = recorder.next_status()
            with recorder.lock:
                recorder.bodies.append(body)
            self.send_response(status)
            self.send_header("Content-Length", "0")
            self.end_headers()

        do_POST = _handle
        do_PUT = _handle

        def log_message(self, *args):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/ingest"


@pytest.fixture()
def server():
    rec = _Recorder()
    srv, url = _make_server(rec)
    yield rec, url
    srv.shutdown()
    srv.server_close()


def _events(spark, n=10):
    return spark.createDataFrame(
        [(i, f"host-{i % 3}", f"msg {i}") for i in range(n)],
        "event_id long, host string, message string",
    ).coalesce(1)


def test_default_status_mapping():
    """default_map_http_status_to_worker_status parity
    (http-worker.c:368-397)."""
    assert default_http_action(200) == "success"
    assert default_http_action(204) == "success"
    for code in (410, 416, 422, 424, 425, 451, 508):
        assert default_http_action(code) == "drop", code
    for code in (100, 301, 304, 400, 401, 404, 428, 500, 503, 504):
        assert default_http_action(code) == "retry", code


def test_batched_post_bodies(spark, server):
    rec, url = server
    dest = HttpDestination(
        url,
        template="$HOST $MESSAGE",
        batch_lines=4,
        delimiter="\n",
        body_prefix="<<",
        body_suffix=">>",
    )
    stats = dest.write(_events(spark, 10))
    assert stats == {"delivered": 10, "dropped": 0, "failed": 0, "batches": 3, "requests": 3}
    assert len(rec.bodies) == 3
    joined = "".join(rec.bodies)
    for i in range(10):
        assert f"host-{i % 3} msg {i}" in joined
    for body in rec.bodies:
        assert body.startswith("<<") and body.endswith(">>")
    # 10 rows in batches of 4 → 4,4,2
    assert sorted(b.count("\n") for b in rec.bodies) == [1, 3, 3]


def test_retry_then_success(spark, server):
    rec, url = server
    rec.script = [503, 200, 200, 200]  # first request bounces once
    dest = HttpDestination(url, batch_lines=4, retry_backoff=0.0)
    stats = dest.write(_events(spark, 10))
    assert stats["delivered"] == 10 and stats["failed"] == 0
    assert stats["requests"] == 4  # 3 batches + 1 retry


def test_drop_status_is_not_retried(spark, server):
    rec, url = server
    rec.script = [422]
    dest = HttpDestination(url, batch_lines=100)
    stats = dest.write(_events(spark, 10))
    assert stats == {"delivered": 0, "dropped": 10, "failed": 0, "batches": 1, "requests": 1}


def test_custom_response_action_overrides_default(spark, server):
    rec, url = server
    rec.script = [418]  # teapot: default would retry; override drops
    dest = HttpDestination(url, batch_lines=100, response_actions={418: "drop"})
    stats = dest.write(_events(spark, 10))
    assert stats["dropped"] == 10 and stats["requests"] == 1


def test_failover_to_alternative_target(spark, server):
    rec, url = server
    # urls[0] is a closed port → connection refused → fail over
    dest = HttpDestination(
        ["http://127.0.0.1:9/dead", url], batch_lines=100, retry_backoff=0.0
    )
    stats = dest.write(_events(spark, 10))
    assert stats["delivered"] == 10
    assert len(rec.bodies) == 1


def test_exhausted_raise_fails_the_job(spark, server):
    rec, url = server
    rec.script = [500] * 50
    dest = HttpDestination(url, batch_lines=100, max_retries=2, retry_backoff=0.0)
    with pytest.raises(Exception, match="undeliverable|RuntimeError"):
        dest.write(_events(spark, 10))


def test_exhausted_drop_counts_failed(spark, server):
    rec, url = server
    rec.script = [500] * 50
    dest = HttpDestination(
        url, batch_lines=100, max_retries=2, retry_backoff=0.0, on_exhausted="drop"
    )
    stats = dest.write(_events(spark, 10))
    assert stats["failed"] == 10 and stats["delivered"] == 0


class _HttpKvClient:
    """Fake redis-like store client: delivers each batch as
    'key=value' lines POSTed to the local recorder server — proving
    the per-partition client / batched-delivery shape the reference's
    connector destinations share (modules/redis/redis.c et al.)."""

    def __init__(self, url):
        self.url = url

    def mset(self, pairs):
        body = "\n".join(f"{k}={v}" for k, v in pairs).encode("utf-8")
        req = urllib.request.Request(self.url, data=body, method="POST")
        with urllib.request.urlopen(req, timeout=10) as resp:
            if resp.status != 200:
                raise RuntimeError(f"kv store returned {resp.status}")


def test_kv_store_destination_pattern(spark, server):
    rec, url = server
    dest = KvStoreDestination(
        client_factory=lambda: _HttpKvClient(url),
        key_template="$HOST",
        value_template="$MESSAGE",
        batch_size=4,
    )
    stats = dest.write(_events(spark, 10))
    assert stats == {"sent": 10, "batches": 3}
    lines = "\n".join(rec.bodies).splitlines()
    assert sorted(lines) == sorted(f"host-{i % 3}=msg {i}" for i in range(10))


def test_streaming_foreachbatch(spark, server):
    rec, url = server
    dest = HttpDestination(url, template="$MESSAGE", batch_lines=8, retry_backoff=0.0)
    with tempfile.TemporaryDirectory() as d:
        _events(spark, 12).write.parquet(f"{d}/in")
        stream = spark.readStream.schema("event_id long, host string, message string").parquet(
            f"{d}/in"
        )
        q = dest.write_stream(stream, checkpoint=f"{d}/ckpt")
        q.awaitTermination(60)
    got = "\n".join(rec.bodies)
    for i in range(12):
        assert f"msg {i}" in got


def test_elasticsearch_http_bulk_framing(spark, server):
    from syslog_ng_spark.sinks import elasticsearch_http

    rec, url = server
    dest = elasticsearch_http(
        url,
        index="logs-2024",
        doc_type="_doc",
        custom_id="$EVENT_ID",
        template='{"msg":"$MESSAGE","host":"$HOST"}',
        batch_lines=5,
    )
    df = _events(spark, 10).withColumnRenamed("event_id", "EVENT_ID")
    stats = dest.write(
        df.selectExpr("EVENT_ID", "host as HOST", "message as MESSAGE")
    )
    assert stats["delivered"] == 10 and stats["failed"] == 0
    assert len(rec.bodies) == 2  # 10 rows / batch_lines=5
    lines = rec.bodies[0].split("\n")
    # NDJSON bulk: action, doc, action, doc, ..., trailing newline
    assert lines[-1] == ""  # body_suffix
    payload = [ln for ln in lines if ln]
    assert len(payload) == 10
    import json as _json

    action = _json.loads(payload[0])
    doc = _json.loads(payload[1])
    assert action["index"]["_index"] == "logs-2024"
    assert action["index"]["_type"] == "_doc"
    assert action["index"]["_id"].isdigit()
    assert doc["host"].startswith("host-") and doc["msg"].startswith("msg ")


def test_elasticsearch_http_omits_empty_type_and_id(spark, server):
    from syslog_ng_spark.sinks import elasticsearch_http

    rec, url = server
    dest = elasticsearch_http(url, index="idx", template='{"m":"$MESSAGE"}', batch_lines=100)
    df = _events(spark, 2)
    dest.write(df.selectExpr("message as MESSAGE"))
    first = [ln for ln in rec.bodies[0].split("\n") if ln][0]
    assert first == '{"index":{"_index":"idx"}}'


def test_elasticsearch_http_escapes_index_and_macro_id(spark, server):
    """A double quote / backslash in the index name or in a
    macro-rendered _id must yield VALID NDJSON (the reference's
    $(format-json) escapes values; unescaped they'd fail the whole
    bulk batch)."""
    import json as _json

    from syslog_ng_spark.sinks import elasticsearch_http

    rec, url = server
    dest = elasticsearch_http(
        url,
        index='lo"gs\\2024',
        custom_id="id-$MESSAGE",
        template='{"m":"$(json-escape $MESSAGE)"}',
        batch_lines=100,
    )
    df = spark.createDataFrame([('say "hi" \\ bye',)], "MESSAGE string")
    stats = dest.write(df)
    assert stats["delivered"] == 1
    payload = [ln for ln in rec.bodies[0].split("\n") if ln]
    action = _json.loads(payload[0])  # raises if escaping is broken
    assert action["index"]["_index"] == 'lo"gs\\2024'
    assert action["index"]["_id"] == 'id-say "hi" \\ bye'
    assert _json.loads(payload[1])["m"] == 'say "hi" \\ bye'
