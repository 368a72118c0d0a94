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
    (str-funcs.c:tf_substr); Spark substring is 1-based, adjust here.
    A negative offset counts from the end ('$(substr $HOST -1)' → last
    char, test_basicfuncs.c)."""
    col = _col(c)
    n = F.length(col)
    pos = F.lit(start + 1) if start >= 0 else F.greatest(n + start + 1, F.lit(1))
    ln = F.lit(length) if length is not None else n
    return col.substr(pos, F.greatest(ln, F.lit(0)))


def strip(c) -> Column:
    return F.trim(_col(c))


def length(c) -> Column:
    return F.length(_col(c))


def replace_delimiter(c, old_delims: str, new_delim: str) -> Column:
    """$(replace-delimiter) — every char in old_delims becomes new_delim."""
    cls = "".join("\\" + ch if ch in r"\^]-[" else ch for ch in old_delims)
    return F.regexp_replace(_col(c), f"[{cls}]", new_delim)


def padding(c, width: int, fill: str = " ") -> Column:
    """$(padding): left-pad to width — a value already at/over the
    width passes through UNTRUNCATED ('$(padding foo 2)' → 'foo',
    test_basicfuncs.c:241; lpad alone would cut it to 'fo')."""
    col = _col(c)
    return F.when(F.length(col) >= width, col).otherwise(F.lpad(col, width, fill))


def indent_multi_line(c, indent: str = "\t") -> Column:
    """$(indent-multi-line): continuation lines get a TAB
    (str-funcs.c tf_indent_multi_line; test_basicfuncs.c:231)."""
    return F.regexp_replace(_col(c), "\n", "\n" + indent)


def sanitize(
    c, replacement: str = "_", invalid_chars: str = "/", ctrl_chars: bool = True
) -> Column:
    """$(sanitize [-r CHAR] [-i CHARS] [-C]) — replace the invalid set
    (default '/') and, unless -C, control chars, each with the
    replacement char (str-funcs.c tf_sanitize + its GOption flags)."""
    import re as _re

    cls = _re.escape(invalid_chars) + ("\\x00-\\x1f" if ctrl_chars else "")
    return F.regexp_replace(_col(c), f"[{cls}]", replacement)


def explode_str(c, delim: str = ",") -> Column:
    return F.split(_col(c), delim, -1)


def implode(c, delim: str = ",") -> Column:
    return F.array_join(_col(c), delim)
