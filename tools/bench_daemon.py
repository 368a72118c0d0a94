#!/usr/bin/env python
"""Daemon-mode throughput: rows/s through a representative conf
(source → level/facility filter → secret-masking rewrite → templated
file destination) on local[N], measured three ways:

- batch        : run_conf over a file source (the engine's home turf)
- file_stream  : run_conf_stream over a directory tail (availableNow)
                 — the REPLAYABLE production daemon path
- socket       : run_conf_stream over a live TCP feed — the dev/test
                 daemon path (Spark's socket source receives on ONE
                 driver thread by design, so this measures the
                 single-connection intake ceiling, like one syslog-ng
                 TCP connection)

Prints one JSON line. Env: SPARK_GRAFT_CPUS (default 32),
BENCH_DAEMON_ROWS (default 2_000_000 batch/file, socket capped 200k).
"""
from __future__ import annotations

import json
import os
import shutil
import socketserver
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("BENCH_DAEMON_ROWS", "2000000"))
N_SOCKET = min(N, int(os.environ.get("BENCH_DAEMON_SOCKET_ROWS", "200000")))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

PROGS = ["nginx", "postgres", "cron", "sshd"]
FACPRI = [(16 << 3) | 6, (3 << 3) | 3, (9 << 3) | 6, (4 << 3) | 4]


def gen_lines(n: int) -> list[str]:
    out = []
    for i in range(n):
        k = i & 3
        out.append(
            f"<{FACPRI[k]}>Jan  5 10:{(i // 60) % 60:02d}:{i % 60:02d} "
            f"host-{i & 31} {PROGS[k]}[{i & 1023}]: request {i} "
            f"secret=tok{i} code={200 + (i & 3)}")
    return out


CONF = """
source s {{ {source} }};
filter f {{ level(info..emerg) and not facility(cron); }};
rewrite r {{ subst("secret=\\\\S+", "secret=***", value("MESSAGE")); }};
destination d {{ file("{out}" template("$ISODATE $HOST $PROGRAM $MSG")); }};
log {{ source(s); filter(f); rewrite(r); destination(d); }};
"""


def count_out(spark, path: str) -> int:
    try:
        return spark.read.text(path).count()
    except Exception:
        return 0


def main() -> None:
    from pyspark.sql import SparkSession

    from syslog_ng_spark.config import run_conf, run_conf_stream

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="bench_daemon_")
    results: dict = {"metric": "daemon_rows_per_sec", "unit": "rows/s",
                     "n_batch": N, "n_socket": N_SOCKET, "cpus": int(CPUS)}
    expect = 3 * N // 4  # cron rows filtered out

    # ---- corpus on disk (shared by batch + file_stream) -------------
    srcdir = os.path.join(tmp, "in")
    os.makedirs(srcdir)
    lines = gen_lines(N)
    shard = N // 8 or 1
    for s in range(0, N, shard):
        with open(os.path.join(srcdir, f"part-{s}.log"), "w") as f:
            f.write("\n".join(lines[s:s + shard]) + "\n")

    # ---- batch -------------------------------------------------------
    out = os.path.join(tmp, "out_batch")
    t0 = time.monotonic()
    run_conf(spark, CONF.format(source=f'file("{srcdir}/*.log");', out=out))
    wall = time.monotonic() - t0
    assert count_out(spark, out) == expect
    results["batch_rps"] = round(N / wall)
    results["batch_wall_s"] = round(wall, 2)

    # ---- file_stream daemon (availableNow drain) ---------------------
    out = os.path.join(tmp, "out_fstream")
    ckpt = os.path.join(tmp, "ckpt_f")
    t0 = time.monotonic()
    for q in run_conf_stream(
            spark, CONF.format(source=f'file("{srcdir}/*.log");', out=out),
            ckpt, available_now=True):
        q.awaitTermination()
    wall = time.monotonic() - t0
    assert count_out(spark, out) == expect
    results["file_stream_rps"] = round(N / wall)
    results["file_stream_wall_s"] = round(wall, 2)

    # ---- live socket daemon ------------------------------------------
    sock_lines = lines[:N_SOCKET]
    expect_sock = sum(1 for i in range(N_SOCKET) if i & 3 != 2)

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            payload = ("\n".join(sock_lines) + "\n").encode()
            t = time.monotonic()
            self.request.sendall(payload)
            results["socket_feed_s"] = round(time.monotonic() - t, 2)
            time.sleep(600)

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), Handler)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    out = os.path.join(tmp, "out_sock")
    ckpt = os.path.join(tmp, "ckpt_s")
    conf = CONF.format(
        source=f'network("127.0.0.1" port({srv.server_address[1]}) '
               'keep-hostname(yes));',
        out=out)
    t0 = time.monotonic()
    queries = run_conf_stream(spark, conf, ckpt)
    try:
        deadline = time.monotonic() + 600
        got = 0
        while time.monotonic() < deadline:
            got = count_out(spark, out)
            if got >= expect_sock:
                break
            time.sleep(0.5)
        wall = time.monotonic() - t0
        assert got >= expect_sock, f"socket drained {got}/{expect_sock}"
        results["socket_rps"] = round(N_SOCKET / wall)
        results["socket_wall_s"] = round(wall, 2)
    finally:
        for q in queries:
            q.stop()
        srv.shutdown()
        srv.server_close()

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
