"""URL normalization and domain rollups for crawl-corpus curation.

The URL-level stages of a web-scale training-data pipeline
(RefinedWeb/CCNet-style): canonicalize URLs so that URL-keyed dedup
and blocklist joins hit, derive the registrable domain for per-domain
quality aggregation and rate caps. Reference-free extension (SURVEY
§2.8) — syslog-ng's closest analog is the http destination's URL
handling, not a parser.

All pure Catalyst string/array expressions; the URL regex runs once
per row per part (no UDFs, no parse_url — its Java implementation is
fine but DuckDB can't replay it, and the explicit regex IS the
documented normalization contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

URL_RE = (
    r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(?::(\d+))?([^?#]*)"
    r"(?:\?([^#]*))?(?:#.*)?$"
)

# tracking params dropped during normalization (the ones that differ
# per click, not per resource)
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "mc_eid")

# second-level public suffixes where the registrable domain is three
# labels (heuristic subset; production swaps in the full Mozilla PSL)
_SECOND_LEVEL_TLDS = (
    "co.uk", "co.jp", "co.in", "co.kr", "co.nz", "co.za",
    "com.au", "com.br", "com.cn", "com.mx", "com.tr", "com.sg",
    "org.uk", "ac.uk", "gov.uk", "net.au", "or.jp", "ne.jp",
)


def _is_tracking(param: Column) -> Column:
    key = F.substring_index(param, "=", 1)
    pred = F.lit(False)
    for t in TRACKING_PARAMS:
        pred = pred | (key.startswith(t) if t.endswith("_") else (key == t))
    return pred


def url_normalize(df: DataFrame, col: str = "url", target: str = "url_norm") -> DataFrame:
    """Canonical URL: scheme+host lowercased, default ports (http:80 /
    https:443) stripped, fragment dropped, tracking params
    (TRACKING_PARAMS) removed, empty path -> '/', query order
    preserved. Non-URL rows yield NULL (route/drop upstream)."""
    u = F.col(col)

    def g(i: int) -> Column:
        return F.regexp_extract(u, URL_RE, i)

    scheme = F.lower(g(1))
    host = F.lower(g(2))
    port = g(3)
    path = F.when(g(4) == "", F.lit("/")).otherwise(g(4))
    keep = F.filter(F.split(g(5), "&"), lambda p: (p != "") & ~_is_tracking(p))
    query = F.array_join(keep, "&")
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when((port == "") | default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        port_part,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return df.withColumn(target, F.when(u.rlike(URL_RE), rebuilt))


def registered_domain(host: Column) -> Column:
    """Registrable domain (eTLD+1) under the built-in suffix subset:
    'a.b.co.uk' -> 'b.co.uk', 'x.y.example.com' -> 'example.com',
    bare/1-label hosts pass through."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    # slice() rejects start 0, so 1-label hosts short-circuit before
    # any slice is evaluated for them
    last2 = F.when(n >= 2, F.array_join(F.slice(parts, n - 1, 2), "."))
    is_2l = F.lit(False)
    for sfx in _SECOND_LEVEL_TLDS:
        is_2l = is_2l | (last2 == sfx)
    take = F.when(is_2l & (n >= 3), F.lit(3)).otherwise(F.lit(2))
    return F.when(n <= 1, host).otherwise(
        F.array_join(F.slice(parts, n - take + 1, take), ".")
    )


def url_host(df: DataFrame, col: str = "url", target: str = "host") -> DataFrame:
    return df.withColumn(target, F.lower(F.regexp_extract(F.col(col), URL_RE, 2)))


def domain_rollup(
    df: DataFrame,
    url_col: str = "url",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-registrable-domain corpus profile: page count, distinct
    normalized URLs, optional weight sum (e.g. token counts) — the
    aggregation behind per-domain caps and domain blocklists. One
    hash-shuffle on domain with map-side partials; distinct URLs via
    approx (HLL) because the exact count would force a second
    (domain, url) shuffle at 100 TB for a diagnostic number."""
    hosted = url_host(url_normalize(df, url_col, "_un"), url_col, "_h")
    dom = registered_domain(F.col("_h"))
    aggs = [
        F.count(F.lit(1)).alias("pages"),
        F.approx_count_distinct("_un").alias("approx_urls"),
    ]
    if weight_col:
        aggs.append(F.sum(weight_col).alias("weight"))
    return hosted.groupBy(dom.alias("domain")).agg(*aggs)
