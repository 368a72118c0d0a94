"""URL / base64 template functions.

Reference: modules/basicfuncs/urlencode.c ($(url-encode)/$(url-decode))
and str-funcs.c $(base64-encode).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def url_encode(c: Column) -> Column:
    return F.url_encode(c)


def url_decode(c: Column) -> Column:
    return F.url_decode(c)


def base64_encode(c: Column) -> Column:
    # Spark's base64 emits RFC 2045 MIME chunking (CRLF every 76
    # chars); the reference emits one unbroken string
    # (test_basicfuncs.c:262's 134-char input)
    return F.regexp_replace(F.base64(c.cast("binary")), "[\r\n]", "")


def base64_decode(c: Column) -> Column:
    return F.unbase64(c).cast("string")
