"""IP functions + netmask math, IPv4 and IPv6.

Reference: modules/basicfuncs/ip-funcs.c ($(ipv4-to-int)),
lib/filter/filter-netmask.c (netmask() filter) and
lib/filter/filter-netmask6.c (netmask6()). Pure integer bit math on
JVM columns — the same arithmetic is expressible in the DuckDB
oracle, so these are hash-verifiable. IPv6 addresses are carried as
two signed 64-bit longs (hi, lo) holding the exact 128-bit pattern;
all masking is bitwise so two's complement never matters.
"""

from __future__ import annotations

import ipaddress

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


def _side_groups(side: Column) -> Column:
    """One side of a '::' split → array<long> of 16-bit group values.
    A dotted-quad token (mapped-IPv4 tail, '::ffff:10.1.2.3')
    contributes TWO groups; hex groups go through conv(…, 16, 10)."""
    toks = F.filter(F.split(side, ":"), lambda t: t != "")
    # the dotted-quad split is bound once per token (4 element_at
    # reads would otherwise re-split 4x — lambda vars bind once)
    quad = lambda t: F.element_at(  # noqa: E731
        F.transform(
            F.array(F.split(t, "\\.")),
            lambda q: F.array(
                F.element_at(q, 1).cast("long") * 256 + F.element_at(q, 2).cast("long"),
                F.element_at(q, 3).cast("long") * 256 + F.element_at(q, 4).cast("long"),
            ),
        ),
        1,
    )
    return F.flatten(
        F.transform(
            toks,
            lambda t: F.when(t.contains("."), quad(t)).otherwise(
                F.array(F.conv(t, 16, 10).cast("long"))
            ),
        )
    )


def _plain_col_name(c: Column) -> str | None:
    """The bare column name when `c` is a simple attribute reference
    (repr form "Column<'name'>" with an identifier inside), else None.
    Spark 4's JVM Column no longer exposes expr().sql(), so this is
    the conservative detector for the SQL-text fast path: anything
    computed falls back to Column construction."""
    import re

    s = repr(c)
    m = re.fullmatch(r"Column<'([A-Za-z_][A-Za-z0-9_]*)'>", s)
    return m.group(1) if m else None


def _ipv6_to_longs_sql(ip_sql: str) -> str:
    """The ipv6_to_longs expression rendered as SQL text: one parser
    call instead of ~500 py4j round trips of Column construction
    (r14; ~0.55 s per call measured). The parsed tree is the one the
    Column path builds — same lambda bindings, same casts."""
    s = f"lower(trim({ip_sql}))"

    def side(side_sql: str) -> str:
        quad = (
            "element_at(transform(array(split(t, '\\\\.')), q -> array("
            "cast(element_at(q, 1) as bigint) * 256 + cast(element_at(q, 2) as bigint), "
            "cast(element_at(q, 3) as bigint) * 256 + cast(element_at(q, 4) as bigint))), 1)"
        )
        return (
            f"flatten(transform(filter(split({side_sql}, ':'), t -> t != ''), "
            f"t -> CASE WHEN contains(t, '.') THEN {quad} "
            f"ELSE array(cast(conv(t, 16, 10) as bigint)) END))"
        )

    dc = f"contains({s}, '::')"
    lg = side(f"CASE WHEN {dc} THEN substring_index({s}, '::', 1) ELSE {s} END")
    rg = side(f"CASE WHEN {dc} THEN substring_index({s}, '::', -1) ELSE '' END")
    bound = (
        f"transform(array(named_struct('dc', {dc}, 'lg', {lg}, 'rg', {rg})), "
        "b -> CASE WHEN b.dc THEN concat(b.lg, "
        "array_repeat(cast(0 as bigint), cast(8 - size(b.lg) - size(b.rg) as int)), "
        "b.rg) ELSE b.lg END)"
    )
    pack = (
        "named_struct("
        "'hi', shiftleft(element_at(g, 1), 48) | shiftleft(element_at(g, 2), 32) | "
        "shiftleft(element_at(g, 3), 16) | element_at(g, 4), "
        "'lo', shiftleft(element_at(g, 5), 48) | shiftleft(element_at(g, 6), 32) | "
        "shiftleft(element_at(g, 7), 16) | element_at(g, 8))"
    )
    return f"element_at(transform({bound}, g -> {pack}), 1)"


def ipv6_to_longs(ip: Column) -> Column:
    """IPv6 string → struct(hi: long, lo: long): the exact 128-bit
    address as two signed longs (hi = first 64 bits). Handles
    '::'-compression and the dotted-quad mapped-IPv4 tail; everything
    is Catalyst array/string functions (split/transform/flatten/conv/
    shiftleft) — no UDF, and the identical arithmetic runs in DuckDB.

    Malformed input produces deterministic garbage (conv parses what
    it can), matching the reference's "invalid address never aborts
    the pipeline" stance (filter-netmask6.c returns false, it doesn't
    error); gate on a validity regex first if you need strictness.

    Rendered as one SQL string when the input is a plain column
    reference (every catalog/conf caller passes one); the Column-API
    construction below is the fallback for computed inputs."""
    name = _plain_col_name(ip)
    if name is not None:
        return F.expr(_ipv6_to_longs_sql(f"`{name}`"))
    s = F.lower(F.trim(ip))
    # Catalyst evaluates every OCCURRENCE of a sub-expression: the
    # naive version referenced the parsed group array `g` 8 times
    # (element_at 1..8), re-running the whole split/transform/flatten
    # parse per reference — the registered_domain pathology (SCALE.md
    # Addendum 9). Lambda variables bind ONCE, so the left/right group
    # arrays and then `g` are materialized via single-element
    # transform() hops and every later use is a variable read.
    has_dc = s.contains("::")
    bound = F.transform(
        F.array(
            F.struct(
                has_dc.alias("dc"),
                _side_groups(
                    F.when(has_dc, F.substring_index(s, "::", 1)).otherwise(s)
                ).alias("lg"),
                _side_groups(
                    F.when(has_dc, F.substring_index(s, "::", -1)).otherwise(F.lit(""))
                ).alias("rg"),
            )
        ),
        lambda b: F.when(
            b["dc"],
            F.concat(
                b["lg"],
                F.array_repeat(
                    F.lit(0).cast("long"),
                    (F.lit(8) - F.size(b["lg"]) - F.size(b["rg"])).cast("int"),
                ),
                b["rg"],
            ),
        ).otherwise(b["lg"]),
    )

    def _pack(g: Column) -> Column:
        hi = (
            F.shiftleft(F.element_at(g, 1), 48)
            .bitwiseOR(F.shiftleft(F.element_at(g, 2), 32))
            .bitwiseOR(F.shiftleft(F.element_at(g, 3), 16))
            .bitwiseOR(F.element_at(g, 4))
        )
        lo = (
            F.shiftleft(F.element_at(g, 5), 48)
            .bitwiseOR(F.shiftleft(F.element_at(g, 6), 32))
            .bitwiseOR(F.shiftleft(F.element_at(g, 7), 16))
            .bitwiseOR(F.element_at(g, 8))
        )
        return F.struct(hi.alias("hi"), lo.alias("lo"))

    return F.element_at(F.transform(bound, _pack), 1)


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def in_netmask6(ip: Column, cidr: str) -> Column:
    """netmask6('addr/prefix') filter (reference:
    lib/filter/filter-netmask6.c). The network constant is computed
    driver-side with the stdlib ipaddress module (which accepts every
    textual form the reference's inet_pton does, including mapped
    IPv4); the per-row side is masked-equality on the (hi, lo) longs.

    Reference semantics preserved exactly: prefix <= 64 compares only
    the masked high 64 bits (get_network_address zeroes the rest);
    prefix > 64 compares hi fully and lo under the remaining mask. A
    missing '/prefix' means /128, and a prefix outside [1, 128] is
    invalid (the reference silently never matches; we raise — a config
    typo should be loud in a batch engine)."""
    addr_s, slash, bits_s = cidr.partition("/")
    prefix = int(bits_s) if slash else 128
    if not 1 <= prefix <= 128:
        raise ValueError(f"netmask6: prefix {prefix} outside [1, 128] in {cidr!r}")
    a = int(ipaddress.IPv6Address(addr_s))
    mask = ((1 << prefix) - 1) << (128 - prefix)
    net = a & mask
    v = ipv6_to_longs(ip)
    hi_cond = v["hi"].bitwiseAND(F.lit(_signed64((mask >> 64) & 0xFFFFFFFFFFFFFFFF))) == F.lit(
        _signed64(net >> 64)
    )
    if prefix <= 64:
        return hi_cond
    lo_cond = v["lo"].bitwiseAND(F.lit(_signed64(mask & 0xFFFFFFFFFFFFFFFF))) == F.lit(
        _signed64(net & 0xFFFFFFFFFFFFFFFF)
    )
    return hi_cond & lo_cond
