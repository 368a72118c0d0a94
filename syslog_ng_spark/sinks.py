"""Destinations.

Reference: modules/affile file() destinations with template'd paths,
modules/afsql, kafka/http writers. Spark mapping: template'd file path
macros (e.g. /logs/$HOST/$YEAR$MONTH) become ``partitionBy`` columns —
the same fan-out, but columnar, splittable and predicate-prunable. The
reference's binary 'logstore' compression is replaced by
parquet+zstd.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, partition_by: Sequence[str] = (), mode: str = "overwrite") -> None:
    w = df.write.mode(mode).option("compression", "zstd")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_text(df: DataFrame, path: str, column: str = "raw", mode: str = "overwrite") -> None:
    df.select(column).write.mode(mode).text(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options) -> None:
    """sql() destination (reference: modules/afsql/afsql.c — INSERT
    per message into a templated table; here one batched JDBC write).
    Exercised end-to-end against embedded Derby (the one JDBC driver
    bundled with Spark) in tests/test_sinks.py; any other driver is a
    jar on the cluster classpath away."""
    df.write.mode(mode).format("jdbc").option("url", url).option("dbtable", table).options(
        **options
    ).save()


def read_jdbc(spark, url: str, table: str, **options) -> DataFrame:
    """sql() source counterpart (afsql reads back what it wrote in the
    reference's tests; same here)."""
    return (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
        .options(**options)
        .load()
    )


def stream_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Test sink: materialize a stream into an in-memory table."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )


def stream_to_parquet(df: DataFrame, path: str, checkpoint: str, output_mode: str = "append"):
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .start()
    )
