"""Hash template functions.

Reference: modules/cryptofuncs/cryptofuncs.c — $(md5) $(sha1) $(sha256)
$(hash). ``stable_uuid`` replaces $(uuid) with a deterministic md5-based
id so pipelines are replayable (random uuids break exactly-once reruns
at scale).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tf_md5(c: Column) -> Column:
    return F.md5(c.cast("string"))


def tf_sha1(c: Column) -> Column:
    return F.sha1(c.cast("string"))


def tf_sha256(c: Column) -> Column:
    return F.sha2(c.cast("string"), 256)


def tf_hash(c: Column, length: int = 64) -> Column:
    """$(hash) truncated sha256 hex, like cryptofuncs' --length option."""
    return F.substring(F.sha2(c.cast("string"), 256), 1, length)


def stable_uuid(*cols: Column) -> Column:
    h = F.md5(F.concat_ws("\x1f", *[c.cast("string") for c in cols]))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
