"""Shared DataFrame utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for when the hot side is too big to
    broadcast: salt the skewed (left) side's key into `salt` shards and
    replicate the right side across shards, so one hot key spreads over
    `salt` reducers instead of melting a single one. AQE's skew-join
    split handles moderate skew automatically; this is the explicit
    fallback for pathological keys (a handful of keys holding most
    rows). Result is identical to a plain join on `key` ONLY for
    inner/left/semi/anti joins; right/full outer would null-extend each
    unmatched right row once per shard, so those modes are rejected."""
    from pyspark.sql import functions as F

    if how not in {"inner", "left", "left_outer", "left_semi", "left_anti"}:
        raise ValueError(
            f"salted_join does not preserve {how!r} semantics: unmatched "
            "right rows would be replicated across salt shards; use "
            "inner/left/left_semi/left_anti"
        )

    salted_l = left.withColumn(
        "_salt", (F.abs(F.hash(F.monotonically_increasing_id())) % salt).cast("int")
    )
    shards = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]).cast("array<int>"))
    )
    out = salted_l.join(shards, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def epoch_seconds(col):
    """Timestamp → fractional epoch seconds, safe for both TIMESTAMP and
    TIMESTAMP_NTZ inputs. Spark 4's ANSI rules forbid casting NTZ
    straight to double; hopping through TIMESTAMP first is a no-op for
    tz-aware values and interprets NTZ in the session timezone (UTC in
    this engine — session.py pins it), which keeps arithmetic on two
    hopped values (gaps, bucket floors) exact."""
    return col.cast("timestamp").cast("double")


def rebalance(df: DataFrame) -> DataFrame:
    """Spread rows across all cores before CPU-heavy per-row work
    (regex parse, tokenize/explode, vector math) — but ONLY when the
    input is under-partitioned. A small parquet table arrives as ONE
    partition (single row group), so the whole chain would run on one
    core — profiled 7.5s vs 0.3s for the shingle explode at sf0.1.

    At cluster scale the input is already thousands of splits, and an
    unconditional repartition would be a pure-cost full shuffle of the
    fact table; the partition-count gate makes this a no-op there. The
    getNumPartitions() probe only plans the scan (no job runs)."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism)
