"""Driver contract for the spark-graft builder (PySpark target).

`queries()` / `oracle_sql()` are backed by syslog_ng_spark.catalog —
one entry per implemented operator from SURVEY.md §2. Queries without
an oracle entry (custom stateful / hash-portable-only ops) get the
driver's rows-only check and are additionally pytest-verified.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from syslog_ng_spark.catalog import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: pricing summary rollup on sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
