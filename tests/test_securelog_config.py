from __future__ import annotations

import hashlib
import tempfile

from pyspark.sql import functions as F

from syslog_ng_spark.config import build_pipeline, run_pipeline
from syslog_ng_spark.operators.securelog import hash_chain, verify_chain


def _logs(spark):
    return spark.createDataFrame(
        [("h1", 1, "a"), ("h1", 2, "b"), ("h2", 1, "x")],
        "host string, event_id int, message string",
    )


def test_hash_chain_values(spark):
    rows = {(r.host, r.event_id): r.chain for r in hash_chain(_logs(spark)).collect()}
    c1 = hashlib.md5(b"a").hexdigest()
    c2 = hashlib.md5((c1 + "b").encode()).hexdigest()
    assert rows[("h1", 1)] == c1
    assert rows[("h1", 2)] == c2
    assert rows[("h2", 1)] == hashlib.md5(b"x").hexdigest()


def test_verify_chain_detects_tamper(spark):
    chained = hash_chain(_logs(spark))
    assert verify_chain(chained).count() == 0
    tampered = chained.withColumn(
        "message",
        F.when((F.col("event_id") == 1) & (F.col("host") == "h1"), F.lit("EVIL")).otherwise(
            F.col("message")
        ),
    )
    bad = verify_chain(tampered)
    # tampering h1's first record breaks it and its successor; h2 untouched
    assert {(r.host, r.event_id) for r in bad.collect()} == {("h1", 1), ("h1", 2)}


def test_config_pipeline_end_to_end(spark):
    lines = [
        "<11>Jan  5 03:04:05 web-01 app[77]: token=abc123 disk failing",
        "<30>Jan  5 03:04:06 web-02 cron[12]: routine ok",
    ]
    with tempfile.TemporaryDirectory() as d:
        with open(d + "/in.log", "w") as f:
            f.write("\n".join(lines))
        spec = {
            "source": {"kind": "file", "path": d + "/in.log"},
            "steps": [
                {"op": "parse-syslog", "flavor": "rfc3164", "year": 2024},
                {"op": "filter-severity", "max": "err"},
                {"op": "rewrite-subst", "field": "message",
                 "pattern": r"token=\S+", "replacement": "token=***"},
                {"op": "set-tag", "tag": "audited"},
            ],
            "destination": {"kind": "parquet", "path": d + "/out"},
        }
        run_pipeline(spark, spec)
        back = spark.read.parquet(d + "/out").collect()
        assert len(back) == 1
        assert back[0].host == "web-01"
        assert back[0].message == "token=*** disk failing"
        assert back[0].tags == ["audited"]


def test_config_unknown_op_raises(spark):
    import pytest

    from syslog_ng_spark.config import _step

    with pytest.raises(ValueError, match="unknown step op"):
        _step(_logs(spark), {"op": "bogus"})


def test_config_round2_steps(spark):
    """The round-2 operators are reachable from a declarative config:
    patterndb rules, suppress, template format."""
    import datetime as dt
    import tempfile

    from syslog_ng_spark.config import build_pipeline

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("h1", "Accepted publickey for root", base),
        ("h1", "Accepted publickey for root", base + dt.timedelta(seconds=5)),
        ("h1", "Failed password for admin", base),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "host string, message string, ts timestamp"
        ).write.parquet(d + "/in")
        spec = {
            "source": {"kind": "parquet", "path": d + "/in"},
            "steps": [
                {
                    "op": "parse-patterndb",
                    "rules": [
                        ["auth_ok", "Accepted @ESTRING:method: @for @ANYSTRING:user@"],
                        ["auth_fail", "Failed password for @ANYSTRING:user@"],
                    ],
                },
                {"op": "format", "template": "$HOST $MSG class=${class}", "target": "line"},
            ],
        }
        out = build_pipeline(spark, spec).collect()
    lines = sorted(r.line for r in out)
    assert lines[0] == "h1 Accepted publickey for root class=auth_ok"
    assert lines[2] == "h1 Failed password for admin class=auth_fail"

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "host string, message string, ts timestamp"
        ).write.parquet(d + "/in")
        spec = {
            "source": {"kind": "parquet", "path": d + "/in"},
            "steps": [{"op": "suppress", "key": ["host", "message"], "seconds": 30}],
        }
        out = build_pipeline(spark, spec).collect()
    got = {(r.host, r.message): r.n_suppressed for r in out}
    assert got[("h1", "Accepted publickey for root")] == 1


def test_config_systemd_journal_source(spark):
    """source {kind: systemd-journal} reads binary .journal files
    through the declarative layer (r8)."""
    import lzma
    import tempfile
    from pathlib import Path

    d = Path(tempfile.mkdtemp())
    fixture = Path(__file__).parent / "fixtures" / "system.journal.xz"
    (d / "system.journal").write_bytes(lzma.decompress(fixture.read_bytes()))
    spec = {
        "source": {"kind": "systemd-journal", "path": str(d / "system.journal")},
        "steps": [],
    }
    df = build_pipeline(spark, spec)
    rows = df.select("program", "message").where("program = 'kernel'").collect()
    assert rows and rows[0].message.startswith("Linux version")


def test_config_network_tls_destination(spark):
    """destination {kind: network, tls: {...}} builds a TlsOptions and
    validates it at config time (bad peer_verify fails loudly)."""
    import pytest

    spec = {
        "source": {"kind": "parquet", "path": "/root/testdata/sf0.001/events.parquet"},
        "steps": [],
        "destination": {
            "kind": "network",
            "targets": [["localhost", 1]],
            "tls": {"peer_verify": "sometimes"},
        },
    }
    with pytest.raises(ValueError, match="peer_verify"):
        run_pipeline(spark, spec)


def test_config_kafka_destination_loud_fail(spark):
    import pytest

    spec = {
        "source": {"kind": "parquet", "path": "/root/testdata/sf0.001/events.parquet"},
        "steps": [],
        "destination": {
            "kind": "kafka",
            "brokers": "b:9092",
            "topic": "logs",
            "message": "$event_type",
        },
    }
    with pytest.raises(NotImplementedError, match="spark.jars.packages"):
        run_pipeline(spark, spec)
