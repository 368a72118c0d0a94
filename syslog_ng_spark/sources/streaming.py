"""Streaming sources.

Reference: modules/afsocket (tcp/udp/syslog drivers) — continuous
ingestion. Spark analogs:
- socket_lines: TCP listener (dev/test; not replayable)
- file_stream: directory-watching ingestion (replayable, exactly-once
  with checkpoints — the production path; syslog relays land files or
  Kafka topics)
- rate_source: deterministic load generator (tests/bench)
- kafka_lines: gated — the kafka connector jar isn't in this container,
  but this is the intended 100 TB ingestion front door.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def socket_lines(spark: SparkSession, host: str = "localhost", port: int = 5140) -> DataFrame:
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
        .withColumnRenamed("value", "raw")
    )


def file_stream(spark: SparkSession, path: str, fmt: str = "text", schema: str | None = None) -> DataFrame:
    reader = spark.readStream.format(fmt)
    if schema:
        reader = reader.schema(schema)
    df = reader.load(path)
    return df.withColumnRenamed("value", "raw") if fmt == "text" else df


def rate_source(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def kafka_package_coordinate() -> str:
    """Maven coordinate of the Kafka connector matching the running
    Spark — what `spark.jars.packages` needs. Spark publishes the
    connector per release, so derive BOTH coordinates instead of
    hardcoding ones that rot: the artifact version from
    pyspark.__version__ and the Scala suffix from the major line
    (4.x distributions are Scala 2.13; 3.x default builds are 2.12)."""
    import pyspark

    major = int(pyspark.__version__.split(".", 1)[0])
    scala = "2.13" if major >= 4 else "2.12"
    return f"org.apache.spark:spark-sql-kafka-0-10_{scala}:{pyspark.__version__}"


def kafka_lines(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """kafka() source (reference: modules/kafka, scl/kafka) — the
    intended 100 TB ingestion front door. Needs the connector on the
    classpath; this container has no jar and no network, so the stub
    fails loudly with the exact one-config-line activation path."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
            .selectExpr("CAST(value AS STRING) AS raw", "timestamp AS ts")
        )
    except Exception as exc:  # pragma: no cover - connector not bundled
        coord = kafka_package_coordinate()
        raise NotImplementedError(
            "kafka connector jar not available in this environment. "
            "To activate, start the session with the connector on the "
            "classpath — one config line:\n"
            f'  SparkSession.builder.config("spark.jars.packages", "{coord}")\n'
            f"or: spark-submit --packages {coord}\n"
            "(no other code change needed; kafka_lines then streams "
            "value/timestamp as raw/ts)."
        ) from exc


def framed_socket_lines(
    spark: SparkSession, host: str = "localhost", port: int = 5140
) -> DataFrame:
    """TCP source with RFC6587 framing: octet-counted and
    newline-framed messages may MIX on one connection, classified per
    frame like the reference's auto-detecting syslog() source
    (lib/logproto/logproto-framed-server.c). Frames spanning
    micro-batches reassemble via per-connection decoder state.
    Output: conn, frame_no, message."""
    from syslog_ng_spark.sources.framing import framed_lines_stream

    return framed_lines_stream(socket_lines(spark, host, port), line_col="raw")
