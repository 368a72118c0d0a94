"""String template functions.

Reference: modules/basicfuncs/str-funcs.c — $(lowercase) $(uppercase)
$(substr) $(strip) $(length) $(replace-delimiter) $(padding)
$(indent-multi-line) $(sanitize) $(explode) $(implode).

All JVM-side Column expressions (whole-stage codegen eligible).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def lowercase(c) -> Column:
    return F.lower(_col(c))


def uppercase(c) -> Column:
    return F.upper(_col(c))


def substr(c, start: int, length: int | None = None) -> Column:
    """$(substr str offset [len]) — offset is 0-based in the reference
    (str-funcs.c:tf_substr); Spark substring is 1-based, adjust here."""
    col = _col(c)
    if length is None:
        return col.substr(F.lit(start + 1), F.length(col) - start)
    return col.substr(start + 1, length)


def strip(c) -> Column:
    return F.trim(_col(c))


def length(c) -> Column:
    return F.length(_col(c))


def replace_delimiter(c, old_delims: str, new_delim: str) -> Column:
    """$(replace-delimiter) — every char in old_delims becomes new_delim."""
    cls = "".join("\\" + ch if ch in r"\^]-[" else ch for ch in old_delims)
    return F.regexp_replace(_col(c), f"[{cls}]", new_delim)


def padding(c, width: int, fill: str = " ") -> Column:
    return F.lpad(_col(c), width, fill)


def indent_multi_line(c, indent: str = "    ") -> Column:
    return F.regexp_replace(_col(c), "\n", "\n" + indent)


def sanitize(c, replacement: str = "_") -> Column:
    """$(sanitize) — replace '/' and control chars (str-funcs.c:tf_sanitize)."""
    return F.regexp_replace(_col(c), "[/\\x00-\\x1f]", replacement)


def explode_str(c, delim: str = ",") -> Column:
    return F.split(_col(c), delim, -1)


def implode(c, delim: str = ",") -> Column:
    return F.array_join(_col(c), delim)
