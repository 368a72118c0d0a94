"""Filename template functions.

Reference: modules/basicfuncs/fname-funcs.c — $(basename) $(dirname).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def basename(c: Column) -> Column:
    return F.element_at(F.split(c, "/"), -1)


def dirname(c: Column) -> Column:
    stripped = F.regexp_replace(c, "/[^/]*$", "")
    return F.when(c.contains("/"), F.when(stripped == "", F.lit("/")).otherwise(stripped)).otherwise(
        F.lit(".")
    )
