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
    return F.base64(c.cast("binary"))


def base64_decode(c: Column) -> Column:
    return F.unbase64(c).cast("string")
