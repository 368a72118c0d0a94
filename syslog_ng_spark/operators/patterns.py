"""Log pattern mining — patternize analog.

Reference: modules/dbparser/patternize.c (pdbtool patternize) clusters
similar messages to propose patterndb rules. The Spark-first
formulation: reduce each message to a *skeleton* (variable parts
masked), then a single groupBy yields the candidate patterns with
support counts and examples — one shuffle, linear, no pairwise
clustering needed (the reference iterates single-linkage over message
pairs, which is quadratic and single-node)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUM_RE = r"\d+(\.\d+)?"
HEX_RE = r"\b0x[0-9a-fA-F]+\b"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def skeleton(message: Column) -> Column:
    """Mask variable tokens: IPs, hex literals, then numbers."""
    s = F.regexp_replace(message, IP_RE, "<IP>")
    s = F.regexp_replace(s, HEX_RE, "<HEX>")
    return F.regexp_replace(s, NUM_RE, "<N>")


def patternize(
    df: DataFrame, message_col: str = "message", min_support: int = 2
) -> DataFrame:
    """Candidate patterns with support count and a deterministic example
    (lexicographic min — portable to the SQL oracle)."""
    sk = df.select(skeleton(F.col(message_col)).alias("pattern"), F.col(message_col))
    return (
        sk.groupBy("pattern")
        .agg(
            F.count(F.lit(1)).alias("support"),
            F.min(message_col).alias("example"),
        )
        .where(F.col("support") >= min_support)
    )
