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


def format_cef(
    device_vendor: str,
    device_product: str,
    device_version: str,
    signature_id: Column,
    name: Column,
    severity: Column,
    **extensions: Column,
) -> Column:
    """$(format-cef-extension)-style CEF rendering (reference:
    modules/cef/format-cef-extension.c): header fields pipe-separated,
    extensions as space-separated k=v."""
    header = F.concat_ws(
        "|",
        F.lit("CEF:0"),
        F.lit(device_vendor),
        F.lit(device_product),
        F.lit(device_version),
        signature_id.cast("string"),
        name.cast("string"),
        severity.cast("string"),
    )
    ext = F.concat_ws(" ", *[F.concat(F.lit(k + "="), c.cast("string")) for k, c in extensions.items()])
    return F.concat(header, F.lit("|"), ext)


def stardate(ts: Column, digits: int = 2) -> Column:
    """$(stardate) (reference: modules/stardate) — year + elapsed-year
    fraction, e.g. 2024.08. Deterministic calendar arithmetic."""
    year = F.year(ts)
    start = F.make_date(year, F.lit(1), F.lit(1)).cast("timestamp")
    end = F.make_date(year + 1, F.lit(1), F.lit(1)).cast("timestamp")
    frac = (ts.cast("double") - start.cast("double")) / (
        end.cast("double") - start.cast("double")
    )
    return F.round(year + frac, digits)
