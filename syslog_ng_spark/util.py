"""Shared DataFrame utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance(df: DataFrame) -> DataFrame:
    """Spread rows across all cores before CPU-heavy per-row work
    (regex parse, tokenize/explode, vector math). A small parquet table
    arrives as ONE partition (single row group), so the whole chain
    would run on one core — profiled 7.5s vs 0.3s for the shingle
    explode at sf0.1. The same rebalance is what a real cluster needs
    after scanning a few large files into wide CPU stages."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
