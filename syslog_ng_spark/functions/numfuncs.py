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


def _int_list(arr: Column) -> Column:
    """Numeric elements of a string/any list as bigint; non-numeric
    elements are skipped (the reference's _tf_num_filter walks the
    argument list and ignores values parse_number rejects)."""
    return F.filter(
        F.transform(arr, lambda x: x.try_cast("bigint")), lambda v: v.isNotNull()
    )


def num_sum(arr: Column) -> Column:
    """$(sum) over a list (reference: numeric-funcs.c tf_num_sum)."""
    return F.aggregate(_int_list(arr), F.lit(0).cast("bigint"), lambda a, x: a + x)


def num_min(arr: Column) -> Column:
    """$(min) over a list."""
    return F.array_min(_int_list(arr))


def num_max(arr: Column) -> Column:
    """$(max) over a list."""
    return F.array_max(_int_list(arr))


def num_average(arr: Column) -> Column:
    """$(average) over a list — int64 arithmetic like the reference
    (truncating division, C semantics; NULL for an all-non-numeric
    list)."""
    ints = _int_list(arr)
    total = F.aggregate(ints, F.lit(0).cast("bigint"), lambda a, x: a + x)
    sz = F.size(ints)
    # (total - total % sz) / sz == C's truncating integer division
    # (Spark's % follows the dividend's sign, like C)
    return F.when(sz > 0, ((total - total % sz) / sz).cast("bigint"))


def binary_chars(*codes) -> Column:
    """$(binary): byte values → the string of those characters
    (reference: misc-funcs.c tf_binary)."""
    return F.concat(*[F.char(F.lit(int(c))) for c in codes])
