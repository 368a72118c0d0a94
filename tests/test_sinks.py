"""Destination round trips — including the sql() destination against
embedded Derby (the JDBC driver Spark bundles), closing the
reference's modules/afsql surface with a real executed path."""

from __future__ import annotations

import datetime as dt
import tempfile

from pyspark.sql import functions as F

from syslog_ng_spark.sinks import read_jdbc, write_jdbc

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def test_jdbc_roundtrip_embedded_derby(spark):
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 5), "host-1", "sshd", "accepted password"),
            (2, dt.datetime(2024, 1, 1, 0, 0, 9), "host-2", "cron", "job started"),
        ],
        "event_id long, ts timestamp, host string, program string, message string",
    )
    with tempfile.TemporaryDirectory() as d:
        url = f"jdbc:derby:{d}/logdb;create=true"
        write_jdbc(df, url, "logs", mode="overwrite", driver=DERBY)
        back = read_jdbc(spark, url, "logs", driver=DERBY)
        assert sorted(tuple(r) for r in back.collect()) == sorted(
            tuple(r) for r in df.collect()
        )


def test_jdbc_append_mode(spark):
    df = spark.createDataFrame([(1, "a")], "id long, msg string")
    with tempfile.TemporaryDirectory() as d:
        url = f"jdbc:derby:{d}/appdb;create=true"
        write_jdbc(df, url, "t", mode="overwrite", driver=DERBY)
        write_jdbc(df.select(F.lit(2).alias("id"), F.lit("b").alias("msg")), url, "t",
                   mode="append", driver=DERBY)
        back = read_jdbc(spark, url, "t", driver=DERBY)
        assert sorted(tuple(r) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_kafka_source_is_documented_hard_block(spark):
    """The spark-sql-kafka package is not in this container and there
    is no network to fetch it — kafka_lines must fail loudly, and the
    error must carry the copy-paste activation path (the exact
    spark.jars.packages coordinate for the running Spark)."""
    import pytest

    from syslog_ng_spark.sources.streaming import (
        kafka_lines,
        kafka_package_coordinate,
    )

    coord = kafka_package_coordinate()
    import pyspark

    assert coord == f"org.apache.spark:spark-sql-kafka-0-10_2.13:{pyspark.__version__}"
    with pytest.raises(NotImplementedError) as ei:
        kafka_lines(spark, "broker:9092", "topic")
    msg = str(ei.value)
    assert "kafka connector" in msg
    assert coord in msg and "spark.jars.packages" in msg and "--packages" in msg


# ---------------------------------------------------------------------------
# kafka destination (record construction is jar-independent; only the
# broker handoff is environment-gated)
# ---------------------------------------------------------------------------


def test_kafka_topic_validation_rules():
    from syslog_ng_spark.sinks import kafka_topic_valid

    assert kafka_topic_valid("logs")
    assert kafka_topic_valid("a-b_c.d0")
    assert kafka_topic_valid("x" * 249)
    assert not kafka_topic_valid("")
    assert not kafka_topic_valid(".")
    assert not kafka_topic_valid("..")
    assert not kafka_topic_valid("x" * 250)
    assert not kafka_topic_valid("bad/topic")
    assert not kafka_topic_valid("has space")
    assert kafka_topic_valid("...")  # three dots IS legal (ref checks . and .. only)


def test_kafka_records_static_topic_and_null_key(spark):
    from syslog_ng_spark.sinks import kafka_records

    df = spark.createDataFrame(
        [(1, "hello", "k1"), (2, "world", "")],
        "event_id long, message string, keysrc string",
    )
    rows = {
        r.value: r
        for r in kafka_records(
            df, message="$MESSAGE", key="${keysrc}", topic="logs"
        ).collect()
    }
    assert rows["hello"].topic == "logs" and rows["hello"].key == "k1"
    # empty rendered key -> NULL key (worker.c:219)
    assert rows["world"].key is None


def test_kafka_records_invalid_static_topic_raises(spark):
    import pytest

    from syslog_ng_spark.sinks import kafka_records

    df = spark.createDataFrame([(1, "m")], "event_id long, message string")
    with pytest.raises(ValueError, match="illegal"):
        kafka_records(df, topic="bad/topic")


def test_kafka_records_templated_topic_requires_fallback(spark):
    import pytest

    from syslog_ng_spark.sinks import kafka_records

    df = spark.createDataFrame([(1, "m", "t1")], "event_id long, message string, t string")
    with pytest.raises(ValueError, match="fallback_topic"):
        kafka_records(df, topic="logs-${t}")
    with pytest.raises(ValueError, match="invalid fallback"):
        kafka_records(df, topic="logs-${t}", fallback_topic="bad/one")


def test_kafka_records_templated_topic_fallback_per_row(spark):
    from syslog_ng_spark.sinks import kafka_records

    df = spark.createDataFrame(
        [(1, "m1", "app1"), (2, "m2", "bad/name"), (3, "m3", "")],
        "event_id long, message string, t string",
    )
    rows = {
        r.value: r.topic
        for r in kafka_records(
            df, message="$MESSAGE", topic="${t}", fallback_topic="dead-letter"
        ).collect()
    }
    assert rows == {"m1": "app1", "m2": "dead-letter", "m3": "dead-letter"}


def test_kafka_sink_loud_fail_carries_activation(spark):
    import pytest

    from syslog_ng_spark.sinks import kafka_sink

    df = spark.createDataFrame([(1, "m")], "event_id long, message string")
    with pytest.raises(NotImplementedError) as ei:
        kafka_sink(df, "broker:9092", topic="logs")
    msg = str(ei.value)
    assert "spark.jars.packages" in msg
    assert "spark-sql-kafka-0-10" in msg


def test_kafka_jar_missing_classifier_is_narrow():
    """Only the connector-jar-absent shapes are translated into the
    activation NotImplementedError; with the jar installed, broker /
    auth / checkpoint errors must surface as themselves."""
    from syslog_ng_spark.sinks import _kafka_jar_missing

    assert _kafka_jar_missing(Exception(
        "[DATA_SOURCE_NOT_FOUND] Failed to find data source: kafka."))
    assert _kafka_jar_missing(Exception(
        "java.lang.ClassNotFoundException: kafka.DefaultSource"))
    assert not _kafka_jar_missing(Exception(
        "org.apache.kafka.common.errors.TimeoutException: "
        "Topic logs not present in metadata after 60000 ms."))
    assert not _kafka_jar_missing(Exception(
        "Connection to node -1 (broker/10.0.0.1:9092) could not be established"))
