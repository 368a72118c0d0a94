"""Output formatting template functions.

Reference: modules/json/format-json.c ($(format-json)),
modules/kvformat/format-welf.c ($(format-welf)),
lib/template — $(format-csv)-style rendering via templates.

``format_json`` uses Spark's ``to_json`` (JVM, codegen) — field order is
struct order, matching the reference's key ordering semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_json(**fields: Column) -> Column:
    """$(format-json k=v ...) — render named columns as a JSON object."""
    return F.to_json(F.struct(*[c.alias(k) for k, c in fields.items()]))


def format_welf(**fields: Column) -> Column:
    """$(format-welf) — space-separated k=v pairs, values stringified."""
    pairs = [F.concat(F.lit(k + "="), c.cast("string")) for k, c in fields.items()]
    return F.concat_ws(" ", *pairs)


def format_csv(*cols: Column, sep: str = ",") -> Column:
    """CSV rendering of columns (template-driven file destinations)."""
    return F.concat_ws(sep, *[c.cast("string") for c in cols])
