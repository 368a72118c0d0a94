"""List template functions.

Reference: modules/basicfuncs/list-funcs.c — $(list-head) $(list-tail)
$(list-nth) $(list-slice) $(list-count) $(list-append) $(list-concat).
Backed by Spark array functions (codegen, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def list_head(arr: Column) -> Column:
    return F.element_at(arr, 1)


def list_tail(arr: Column) -> Column:
    return F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))


def list_nth(arr: Column, n: int) -> Column:
    """0-based like the reference (list-funcs.c:tf_list_nth)."""
    return F.element_at(arr, n + 1)


def list_slice(arr: Column, start: int, end: int | None = None) -> Column:
    """$(list-slice start:end) — 0-based, end-exclusive."""
    if end is None:
        return F.slice(arr, start + 1, F.greatest(F.size(arr) - start, F.lit(0)))
    return F.slice(arr, start + 1, max(end - start, 0))


def list_count(arr: Column) -> Column:
    return F.size(arr)


def list_append(arr: Column, *items) -> Column:
    out = arr
    for it in items:
        out = F.array_append(out, it)
    return out


def list_concat(*arrs) -> Column:
    return F.concat(*arrs)


def list_search(
    arr: Column, pattern: str | Column, mode: str = "literal", start_index: int = 0
) -> Column:
    """$(list-search): 0-based index of the FIRST element matching
    `pattern` from `start_index` on, empty string when nothing matches
    (reference: modules/basicfuncs/list-funcs.c tf_list_search_call —
    index printed, loop breaks on first hit). Modes mirror the
    reference's string_matcher: literal, prefix, substring, pcre
    (glob is approximated by translating to pcre upstream)."""
    preds = {
        "literal": lambda x: x == pattern,
        "prefix": lambda x: x.startswith(pattern),
        "substring": lambda x: x.contains(pattern),
        "pcre": lambda x: x.rlike(pattern),
    }
    if mode not in preds:
        raise ValueError(f"list-search: invalid mode {mode!r}")
    p = preds[mode]
    flags = F.transform(arr, lambda x, i: p(x) & (i >= start_index))
    idx = F.array_position(flags, F.lit(True))
    return F.when(idx > 0, (idx - 1).cast("string")).otherwise(F.lit(""))
