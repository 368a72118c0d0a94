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


def tf_sha512(c: Column) -> Column:
    """$(sha512) (cryptofuncs.c:168 registers the EVP digest by name)."""
    return F.sha2(c.cast("string"), 512)


def _md4_digest(data: bytes) -> str:
    """RFC 1320 MD4 over one byte string → lowercase hex.

    Pure Python: OpenSSL 3 removed MD4 from the default provider, so
    hashlib.new('md4') raises on modern hosts; the reference gets it
    from EVP legacy (cryptofuncs.c:96 EVP_get_digestbyname). Only used
    inside the Arrow-batched $(md4) UDF — never in a JVM-expressible
    hot path."""
    import struct

    def lrot(x: int, n: int) -> int:
        x &= 0xFFFFFFFF
        return ((x << n) | (x >> (32 - n))) & 0xFFFFFFFF

    msg = bytearray(data)
    bitlen = (8 * len(msg)) & 0xFFFFFFFFFFFFFFFF
    msg.append(0x80)
    while len(msg) % 64 != 56:
        msg.append(0)
    msg += struct.pack("<Q", bitlen)

    a0, b0, c0, d0 = 0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476
    for off in range(0, len(msg), 64):
        x = struct.unpack("<16I", bytes(msg[off : off + 64]))
        a, b, c, d = a0, b0, c0, d0
        # round 1: F(x,y,z) = (x & y) | (~x & z)
        for i in range(16):
            k, s = i, (3, 7, 11, 19)[i % 4]
            if i % 4 == 0:
                a = lrot(a + ((b & c) | (~b & d)) + x[k], s)
            elif i % 4 == 1:
                d = lrot(d + ((a & b) | (~a & c)) + x[k], s)
            elif i % 4 == 2:
                c = lrot(c + ((d & a) | (~d & b)) + x[k], s)
            else:
                b = lrot(b + ((c & d) | (~c & a)) + x[k], s)
        # round 2: G(x,y,z) = (x&y) | (x&z) | (y&z), +0x5A827999
        order2 = (0, 4, 8, 12, 1, 5, 9, 13, 2, 6, 10, 14, 3, 7, 11, 15)
        for i in range(16):
            k, s = order2[i], (3, 5, 9, 13)[i % 4]
            if i % 4 == 0:
                a = lrot(a + ((b & c) | (b & d) | (c & d)) + x[k] + 0x5A827999, s)
            elif i % 4 == 1:
                d = lrot(d + ((a & b) | (a & c) | (b & c)) + x[k] + 0x5A827999, s)
            elif i % 4 == 2:
                c = lrot(c + ((d & a) | (d & b) | (a & b)) + x[k] + 0x5A827999, s)
            else:
                b = lrot(b + ((c & d) | (c & a) | (d & a)) + x[k] + 0x5A827999, s)
        # round 3: H(x,y,z) = x ^ y ^ z, +0x6ED9EBA1
        order3 = (0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15)
        for i in range(16):
            k, s = order3[i], (3, 9, 11, 15)[i % 4]
            if i % 4 == 0:
                a = lrot(a + (b ^ c ^ d) + x[k] + 0x6ED9EBA1, s)
            elif i % 4 == 1:
                d = lrot(d + (a ^ b ^ c) + x[k] + 0x6ED9EBA1, s)
            elif i % 4 == 2:
                c = lrot(c + (d ^ a ^ b) + x[k] + 0x6ED9EBA1, s)
            else:
                b = lrot(b + (c ^ d ^ a) + x[k] + 0x6ED9EBA1, s)
        a0 = (a0 + a) & 0xFFFFFFFF
        b0 = (b0 + b) & 0xFFFFFFFF
        c0 = (c0 + c) & 0xFFFFFFFF
        d0 = (d0 + d) & 0xFFFFFFFF
    return struct.pack("<4I", a0, b0, c0, d0).hex()


def tf_md4(c: Column) -> Column:
    """$(md4) — Arrow-batched pandas UDF around the pure-Python RFC 1320
    core (see _md4_digest for why not hashlib). Slow path by design:
    md4 exists for legacy parity only (cryptofuncs.c:165)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _md4(s):
        return s.map(lambda v: None if v is None else _md4_digest(str(v).encode("utf-8")))

    # explicit annotations: PEP 563 stringified hints can't name the
    # function-local pandas import, so pyspark's hint inspection needs
    # the real types attached
    _md4.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_md4, "string")(c.cast("string"))


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
