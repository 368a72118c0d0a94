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
    """sql() destination (reference: modules/afsql). Needs a JDBC driver
    jar on the classpath; interface kept for cluster deployments."""
    df.write.mode(mode).format("jdbc").option("url", url).option("dbtable", table).options(
        **options
    ).save()


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
