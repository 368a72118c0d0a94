"""Log integrity hash chains.

Reference: modules/secure-logging — each log record carries a MAC
derived from the previous record's key so truncation/tampering is
detectable. Spark formulation: per host (the chain key), order
messages and fold md5(prev_chain || message). The fold is inherently
sequential *within* a key but independent *across* keys, so it's an
applyInPandas grouped map: each host's chain computes in one task,
thousands of hosts compute in parallel — the right parallelism axis
for an operation that cannot be expressed as a window function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame


def hash_chain(
    df: DataFrame,
    key: Sequence[str] = ("host",),
    order: Sequence[str] = ("event_id",),
    message_col: str = "message",
    seed: str = "",
) -> DataFrame:
    """Append a `chain` column: chain_i = md5(chain_{i-1} + message_i),
    chain_0 = md5(seed + message_0). Deterministic given (key, order)."""
    key = list(key)
    order = list(order)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", chain string"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        prev = seed
        chains = []
        for m in pdf[message_col].astype(str):
            prev = hashlib.md5((prev + m).encode("utf-8")).hexdigest()
            chains.append(prev)
        pdf["chain"] = chains
        return pdf

    return df.groupBy(*key).applyInPandas(fold, schema=out_schema)


def verify_chain(df: DataFrame, key: Sequence[str] = ("host",), order: Sequence[str] = ("event_id",), message_col: str = "message", chain_col: str = "chain", seed: str = "") -> DataFrame:
    """Recompute and compare: rows whose stored chain doesn't match the
    recomputed value (tampering/truncation detector)."""
    recomputed = hash_chain(
        df.drop(chain_col), key=key, order=order, message_col=message_col, seed=seed
    ).withColumnRenamed("chain", "_expected")
    on = list(key) + list(order)
    joined = df.join(recomputed.select(*on, "_expected"), on=on)
    return joined.where(joined[chain_col] != joined["_expected"])
