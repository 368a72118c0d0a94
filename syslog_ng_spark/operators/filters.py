"""Filter expressions.

Reference: lib/filter/* — filters are boolean expression trees over a
LogMessage. Here each filter returns a ``Column`` (boolean) so they
compose with ``&``/``|``/``~`` exactly like the reference's and/or/not
(lib/filter/filter-op.c), and Catalyst pushes the conjunctions down to
the parquet scan (verify: PushedFilters in explain()).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from syslog_ng_spark.datamodel import FACILITY_NAMES, SEVERITY_NAMES
from syslog_ng_spark.functions.ipfuncs import in_netmask, in_netmask6  # noqa: F401  (re-export)


def _sev_num(level: int | str) -> int:
    return level if isinstance(level, int) else SEVERITY_NAMES.index(level)


def _fac_num(fac: int | str) -> int:
    return fac if isinstance(fac, int) else FACILITY_NAMES.index(fac)


def severity_filter(severity: Column, lo: int | str, hi: int | str | None = None) -> Column:
    """level(err) / level(warning..emerg) (reference: lib/filter/filter-pri.c).

    Note severity 0 is most urgent; level(err..emerg) means sev <= 3.
    A single level means exactly that level.
    """
    lo_n = _sev_num(lo)
    if hi is None:
        return severity == lo_n
    hi_n = _sev_num(hi)
    lo_n, hi_n = min(lo_n, hi_n), max(lo_n, hi_n)
    return (severity >= lo_n) & (severity <= hi_n)


def severity_at_least(severity: Column, level: int | str) -> Column:
    """Messages at `level` urgency or worse (sev <= level)."""
    return severity <= _sev_num(level)


def facility_filter(facility: Column, *facs: int | str) -> Column:
    return facility.isin([_fac_num(f) for f in facs])


def match_filter(col: Column, pattern: str) -> Column:
    """program()/host()/message() regex matching (lib/filter/filter-re.c)."""
    return col.rlike(pattern)


def in_list_filter(col: Column, values: Iterable) -> Column:
    """in-list() (lib/filter/filter-in-list.c). For big lists prefer
    `in_list_join` (broadcast semi-join) — isin() inlines literals into
    the plan which breaks down at ~10k values."""
    return col.isin(list(values))


def in_list_join(df: DataFrame, col: str, values_df: DataFrame, value_col: str) -> DataFrame:
    """Scale path for in-list(): broadcast LEFT SEMI join against the
    list relation instead of literal IN — O(1) plan size, works for
    million-entry lists."""
    return df.join(
        F.broadcast(values_df.select(F.col(value_col).alias(col)).distinct()),
        on=col,
        how="left_semi",
    )


def netmask_filter(ip_col: Column, cidr: str) -> Column:
    """netmask() (lib/filter/filter-netmask.c) as int range compare."""
    return in_netmask(ip_col, cidr)


def netmask6_filter(ip_col: Column, cidr: str) -> Column:
    """netmask6() (lib/filter/filter-netmask6.c) — masked equality on
    the address's (hi, lo) 64-bit halves; handles '::' compression and
    mapped-IPv4 text forms."""
    return in_netmask6(ip_col, cidr)


def tags_filter(tags: Column, *wanted: str) -> Column:
    """tags() (lib/filter/filter-tags.c) — any of the given tags set."""
    cond = F.array_contains(tags, wanted[0])
    for t in wanted[1:]:
        cond = cond | F.array_contains(tags, t)
    return cond


def match_store(
    df,
    col: str,
    pattern: str,
    target: str = "sdata",
):
    """match(... flags(store-matches)) (lib/filter/filter-re.c
    LMF_STORE_MATCHES / lib/logmatcher.c): rows that match keep
    flowing AND the capture groups land in the NV map under numeric
    names — '0' is the whole match, '1'..'N' the groups — exactly how
    the reference stores them into the nv-table, so template
    strings reference them as $0/$1/... (template.schema_resolver
    falls through to the sdata map for numeric names).

    Non-participating optional groups store '' (the reference unsets
    them; '' renders identically in templates). NAMED groups
    ((?P<name>...) PCRE-style or (?<name>...) Java-style) additionally
    store under their name, like LogMatcherPcre's named-substring walk
    (lib/logmatcher.c). Group structure comes from the compiled Python
    regex; the JVM-side pattern has the names STRIPPED (Java rejects
    PCRE's (?P<..> spelling and underscores in group names) and
    extracts positionally — names and positions refer to the same
    capture. One regexp pass per group + the rlike gate."""
    import re as _re

    from syslog_ng_spark.functions.format import _merge_maps

    # normalize Java-style (?<name>...) / \k<name> to Python's
    # (?P<name>...) / (?P=name) for structure analysis, then strip ALL
    # names for the JVM pattern — with named BACKREFERENCES rewritten
    # to their numeric \N form (a stripped pattern referencing a named
    # group would throw PatternSyntaxException JVM-side)
    py_pattern = _re.sub(r"\(\?<([A-Za-z_][A-Za-z0-9_]*)>", r"(?P<\1>", pattern)
    py_pattern = _re.sub(r"\\k<([A-Za-z_][A-Za-z0-9_]*)>", r"(?P=\1)", py_pattern)
    compiled = _re.compile(py_pattern)

    def _backref_to_num(m):
        name = m.group(1)
        idx = compiled.groupindex.get(name)
        if idx is None:  # unreachable: _re.compile above rejects it
            raise ValueError(f"match_store: backreference to unknown group {name!r}")
        return "\\" + str(idx)

    jvm_pattern = _re.sub(
        r"\(\?P=([A-Za-z_][A-Za-z0-9_]*)\)", _backref_to_num, py_pattern)
    jvm_pattern = _re.sub(r"\(\?P?<[A-Za-z_][A-Za-z0-9_]*>", "(", jvm_pattern)
    c = F.col(col)
    kv = []
    for i in range(compiled.groups + 1):
        kv.extend([F.lit(str(i)), F.regexp_extract(c, jvm_pattern, i)])
    for name, idx in compiled.groupindex.items():
        kv.extend([F.lit(name), F.regexp_extract(c, jvm_pattern, idx)])
    groups_map = F.create_map(*kv)
    merged = (
        _merge_maps(F.coalesce(F.col(target), F.create_map().cast("map<string,string>")), groups_map)
        if target in df.columns
        else groups_map
    )
    return df.where(c.rlike(jvm_pattern)).withColumn(target, merged)


def _atoi(c: Column) -> Column:
    """C atoi: skip leading whitespace, optional sign + digits, else 0
    (filter-cmp.c's numeric mode parses both sides this way)."""
    # try_cast: the extract yields '' for non-numeric text and ANSI
    # cast would kill the job on it
    return F.coalesce(
        F.regexp_extract(c, r"^[ \t\n]*([+-]?\d+)", 1).try_cast("long"), F.lit(0)
    )


_CMP_OPS = {
    "==": lambda l, r: l == r,
    "!=": lambda l, r: l != r,
    "<": lambda l, r: l < r,
    ">": lambda l, r: l > r,
    "<=": lambda l, r: l <= r,
    ">=": lambda l, r: l >= r,
}


def cmp_filter(df, left: str, right: str, op: str, numeric: bool = True) -> Column:
    """'"$LEFT" op "$RIGHT"' comparison filter (lib/filter/
    filter-cmp.c): both sides are TEMPLATE strings rendered per row;
    numeric ops (the symbolic ones: == != < > <= >=) compare via
    atoi — leading integer, non-numeric text counts as 0 — and the
    string forms (eq ne lt gt le ge in the config grammar) compare
    byte-wise. Pass numeric=False for the string forms. Returns a
    boolean Column for .where()."""
    from syslog_ng_spark.template import compile_template

    if op not in _CMP_OPS:
        raise ValueError(f"unknown comparison op {op!r}")
    lc = compile_template(left, df)
    rc = compile_template(right, df)
    if numeric:
        lc, rc = _atoi(lc), _atoi(rc)
    return _CMP_OPS[op](lc, rc)
