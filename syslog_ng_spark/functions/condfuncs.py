"""Conditional template functions.

Reference: modules/basicfuncs/cond-funcs.c — $(if cond a b), $(or a b...),
$(grep cond value) over correlation contexts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tf_if(cond: Column, then, otherwise) -> Column:
    return F.when(cond, then).otherwise(otherwise)


def tf_or(*cols) -> Column:
    """First non-empty value — the reference treats '' as unset."""
    cleaned = [F.when((c.isNotNull()) & (c != ""), c) for c in cols]
    return F.coalesce(*cleaned)


def grep(arr: Column, predicate) -> Column:
    """$(grep) over a collected context → array filter (lambda Column->Column)."""
    return F.filter(arr, predicate)
