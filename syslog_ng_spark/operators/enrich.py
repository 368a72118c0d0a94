"""Enrichment operators.

Reference: modules/add-contextual-data — joins a small CSV "context
database" onto messages by a selector template; modules/geoip2 — IP →
geo attributes. Both are, in Spark terms, broadcast hash joins of a
dimension relation onto the event stream: the dimension ships to every
executor once and the 100 TB fact side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def add_contextual_data(
    events: DataFrame,
    context: DataFrame,
    selector: str,
    context_selector: str | None = None,
    prefix: str = "",
    default: dict[str, str] | None = None,
) -> DataFrame:
    """add-contextual-data(selector(...), database(...)).

    `context` columns (minus its selector) are appended, optionally
    prefixed; unmatched selectors fall back to `default` values —
    mirroring the reference's default-selector support
    (modules/add-contextual-data/add-contextual-data.c).
    """
    csel = context_selector or selector
    dim = context.withColumnRenamed(csel, selector) if csel != selector else context
    value_cols = [c for c in dim.columns if c != selector]
    if prefix:
        for c in value_cols:
            dim = dim.withColumnRenamed(c, prefix + c)
        value_cols = [prefix + c for c in value_cols]
    joined = events.join(F.broadcast(dim), on=selector, how="left")
    if default:
        for c, v in default.items():
            name = prefix + c
            if name in joined.columns:
                joined = joined.withColumn(name, F.coalesce(F.col(name), F.lit(v)))
    return joined


def geoip_range_enrich(
    events: DataFrame,
    ranges: DataFrame,
    ip_col: str = "ip",
    start_col: str = "start_int",
    end_col: str = "end_int",
    bucket_bits: int = 16,
) -> DataFrame:
    """GeoIP by IP-range lookup (reference: modules/geoip2/
    maxminddb-helper.c walks the mmdb binary trie per message). The
    Spark-native database is a GeoLite-format interval table
    (start_int <= ip_int <= end_int, attribute columns), and the
    lookup is a broadcast HASH join, not a nested-loop range join:
    every range is exploded into the /N prefix buckets it covers
    (N=bucket_bits), the event side joins on its ip's bucket — an
    equi-key — and the interval check rides along as a residual join
    condition. GeoLite2 has ~400k ranges mostly finer than /16, so
    the expansion factor stays near 1 and the broadcast stays small,
    while the 100 TB fact side never shuffles and never sees a
    BroadcastNestedLoopJoin.

    Ranges must be disjoint (true of real GeoIP snapshots); an
    overlapping table would duplicate matching rows."""
    from syslog_ng_spark.functions.ipfuncs import ipv4_to_int

    shift = 32 - bucket_bits
    expanded = ranges.withColumn(
        "_rb",
        F.explode(
            F.sequence(
                F.shiftright(F.col(start_col).cast("long"), shift),
                F.shiftright(F.col(end_col).cast("long"), shift),
            )
        ),
    )
    ip_int = ipv4_to_int(F.col(ip_col)).cast("long")
    ev = events.withColumn("_eb", F.shiftright(ip_int, shift))
    joined = ev.join(
        F.broadcast(expanded),
        (F.col("_eb") == F.col("_rb"))
        & ip_int.between(F.col(start_col), F.col(end_col)),
        "left",
    )
    return joined.drop("_eb", "_rb", start_col, end_col)


def geoip_stub(events: DataFrame, ip_col: str) -> DataFrame:
    """geoip2 plumbing with a deterministic fake database: real engines
    plug a broadcast range-join (ip_int BETWEEN lo AND hi) here. The
    maxminddb library is absent in this container, so the 'database' is
    a derived /8 bucket — the join shape (broadcast range join on int
    ranges) is the part that matters at scale."""
    from syslog_ng_spark.functions.ipfuncs import ipv4_to_int

    octet = (ipv4_to_int(F.col(ip_col)) / 16777216).cast("int")
    return events.withColumn(
        "geo_region",
        F.concat(F.lit("region-"), (octet % 16).cast("string")),
    )
