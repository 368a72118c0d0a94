"""Numeric template functions.

Reference: modules/basicfuncs/numeric-funcs.c — $(+) $(-) $(*) $(/)
$(%) $(round) $(ceil) $(floor). The reference operates on int64 with
truncating division; we expose both int and double paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else (F.lit(c) if isinstance(c, (int, float)) else c)


def num_plus(a, b) -> Column:
    return _col(a) + _col(b)


def num_minus(a, b) -> Column:
    return _col(a) - _col(b)


def num_multi(a, b) -> Column:
    return _col(a) * _col(b)


def num_div(a, b) -> Column:
    """Integer-truncating division like the reference's $(/) on int64."""
    return (_col(a) / _col(b)).cast("long")


def num_mod(a, b) -> Column:
    return _col(a) % _col(b)


def num_round(c, digits: int = 0) -> Column:
    return F.round(_col(c), digits)


def num_ceil(c) -> Column:
    return F.ceil(_col(c))


def num_floor(c) -> Column:
    return F.floor(_col(c))
