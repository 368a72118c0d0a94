"""IP functions + netmask math.

Reference: modules/basicfuncs/ip-funcs.c ($(ipv4-to-int)) and
lib/filter/filter-netmask.c (netmask() filter). Pure integer bit math
on JVM columns — the same arithmetic is expressible in the DuckDB
oracle, so these are hash-verifiable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ipv4_to_int(ip: Column) -> Column:
    """Dotted-quad string → uint32 as bigint."""
    p = F.split(ip, "\\.")
    return (
        F.element_at(p, 1).cast("long") * 16777216
        + F.element_at(p, 2).cast("long") * 65536
        + F.element_at(p, 3).cast("long") * 256
        + F.element_at(p, 4).cast("long")
    )


def in_netmask(ip: Column, cidr: str) -> Column:
    """netmask('a.b.c.d/len') filter (reference: lib/filter/filter-netmask.c:46).

    Implemented as integer range compare so Catalyst can push it down.
    """
    net, _, bits = cidr.partition("/")
    bits = int(bits or 32)
    parts = [int(x) for x in net.split(".")]
    base = parts[0] * 16777216 + parts[1] * 65536 + parts[2] * 256 + parts[3]
    mask = ((1 << bits) - 1) << (32 - bits) if bits else 0
    lo = base & mask
    hi = lo + (1 << (32 - bits)) - 1
    v = ipv4_to_int(ip)
    return (v >= lo) & (v <= hi)
