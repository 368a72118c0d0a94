"""Output formatting template functions.

Reference: modules/json/format-json.c ($(format-json)),
modules/kvformat/format-welf.c ($(format-welf)),
lib/template — $(format-csv)-style rendering via templates.

``format_json`` uses Spark's ``to_json`` (JVM, codegen) — field order is
struct order, matching the reference's key ordering semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..util import epoch_seconds


def format_json(**fields: Column) -> Column:
    """$(format-json k=v ...) — render named columns as a JSON object."""
    return F.to_json(F.struct(*[c.alias(k) for k, c in fields.items()]))


def _glob_rx(glob: str) -> str:
    """fnmatch-style glob → anchored regex (value-pairs --key/--exclude
    use glob patterns; lib/value-pairs/value-pairs.c vp_pairs_foreach)."""
    import re as _re

    return "^" + "".join(
        ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch) for ch in glob
    ) + "$"


def _match_any(k: Column, globs) -> Column:
    out = F.lit(False)
    for g in globs:
        out = out | k.rlike(_glob_rx(g))
    return out


def _merge_maps(*maps: Column) -> Column:
    """map union where LATER maps override earlier keys — the
    reference's NV-assignment semantics (a re-set name replaces its
    value). Implemented as plain map_concat under
    spark.sql.mapKeyDedupPolicy=LAST_WIN (set here on the active
    session: the default EXCEPTION policy would turn a collision into
    a job-killing DUPLICATED_MAP_KEY). LAST_WIN is O(k) JVM-side —
    r4 measurement on format_json_scoped at sf0.1: 1.97s vs 2.52s for
    the r2-r3 O(k^2) entry-fold this replaces (and the gap widens with
    row count; the fold's history and rejected alternatives live in
    the git log of this file).

    Two documented consequences, both verified oracle-neutral:
    - the policy is session-wide; every map_concat in the engine
      becomes last-wins, which IS this engine's stated semantics
      (rewrite.set, sdata context merge, map-value-pairs).
    - a shadowed key keeps its FIRST position (with the last value)
      instead of moving to the end; no consumer observes entry order
      (format_json sorts entries; map equality is order-insensitive).
    """
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        # Without an armed LAST_WIN policy the returned map_concat would
        # die at runtime with DUPLICATED_MAP_KEY on the first collision
        # (default policy is EXCEPTION) — fail loudly at plan-build time
        # instead of silently deferring the blow-up. Callers must build
        # plans with an active session (session.get_session()).
        raise RuntimeError(
            "_merge_maps requires an active SparkSession to set "
            "spark.sql.mapKeyDedupPolicy=LAST_WIN (map re-assignment is "
            "last-wins in this engine); build plans via "
            "syslog_ng_spark.session.get_session() or inside an active session"
        )
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    return F.map_concat(*maps)


def value_pairs(
    nv: Column,
    core: dict[str, Column] | None = None,
    scope: str = "all-nv-pairs",
    key: list[str] | None = None,
    exclude: list[str] | None = None,
    rekey_add_prefix: str | None = None,
    rekey_replace_prefix: tuple[str, str] | None = None,
    rekey_shift: int = 0,
    pairs: dict[str, Column] | None = None,
) -> Column:
    """value-pairs() selection → one map<string,string> Column.
    `pairs` are explicit --pair k=v entries: always included,
    exempt from scope/exclude filtering AND from rekey (value-pairs.c
    applies transforms to message names, not explicit pairs).

    Reference: lib/value-pairs/value-pairs.c (scopes vp_scope_names:
    nv-pairs = names not starting with '.', dot-nv-pairs, all-nv-pairs,
    rfc3164/core = the hard field set, sdata = .SDATA.*, everything)
    and lib/value-pairs/transforms.c (rekey add-prefix / shift /
    replace-prefix). --key globs ADD matching nv names to the scope
    selection; --exclude globs remove after selection — the same
    include-then-exclude order as vp_msg_nvpairs_foreach.

    All map surgery is JVM-side (map_filter / transform_keys /
    map_concat) — no UDFs."""
    scopes = set(scope.replace(",", " ").split())

    def scope_pred(k: Column) -> Column:
        p = F.lit(False)
        if {"all-nv-pairs", "everything"} & scopes:
            p = p | F.lit(True)
        if "nv-pairs" in scopes:
            p = p | ~k.startswith(".")
        if "dot-nv-pairs" in scopes:
            p = p | k.startswith(".")
        if "sdata" in scopes:
            p = p | k.startswith(".SDATA.")
        return p

    def selected(k: Column, v: Column) -> Column:
        pred = scope_pred(k)
        if key:
            pred = pred | _match_any(k, key)
        if exclude:
            pred = pred & ~_match_any(k, exclude)
        return pred & v.isNotNull()

    m = F.map_filter(nv, selected)

    core_scoped = bool({"rfc3164", "core", "base", "rfc5424", "syslog-proto",
                        "everything", "selected-macros"} & scopes)
    core_map = None
    if core:
        import fnmatch

        names = []
        for name in core:
            inc = core_scoped or (key and any(fnmatch.fnmatch(name, g) for g in key))
            if inc and exclude and any(fnmatch.fnmatch(name, g) for g in exclude):
                inc = False
            if inc:
                names.append(name)
        if names:
            kv = []
            for name in sorted(names):
                kv.extend([F.lit(name), core[name].cast("string")])
            core_map = F.create_map(*kv)

    if core_map is not None:
        m = _merge_maps(core_map, m)

    def rekey(k: Column) -> Column:
        out = k
        if rekey_shift:
            out = F.substring(out, rekey_shift + 1, 2147483647)
        if rekey_replace_prefix:
            old, new = rekey_replace_prefix
            out = F.when(
                out.startswith(old),
                F.concat(F.lit(new), F.substring(out, len(old) + 1, 2147483647)),
            ).otherwise(out)
        if rekey_add_prefix:
            out = F.concat(F.lit(rekey_add_prefix), out)
        return out

    if rekey_shift or rekey_replace_prefix or rekey_add_prefix:
        m = F.transform_keys(m, lambda k, v: rekey(k))
    if pairs:
        kv = []
        for name in sorted(pairs):
            kv.extend([F.lit(name), pairs[name].cast("string")])
        m = _merge_maps(m, F.create_map(*kv))
    return m


def _json_escape(c: Column) -> Column:
    return F.regexp_replace(F.regexp_replace(c, r"\\", r"\\\\"), '"', '\\\\"')


def format_json_scoped(
    nv: Column,
    core: dict[str, Column] | None = None,
    **vp_opts,
) -> Column:
    """$(format-json --scope ... --key ... --exclude ... --rekey ...):
    the value_pairs selection rendered as a JSON object with keys in
    binary-sorted order (deterministic across engines; the reference
    emits insertion order, which has no stable analog for a dynamic
    map)."""
    m = value_pairs(nv, core, **vp_opts)
    entries = F.array_sort(F.map_entries(m))
    body = F.array_join(
        F.transform(
            entries,
            lambda e: F.concat(
                F.lit('"'),
                _json_escape(e["key"]),
                F.lit('":"'),
                _json_escape(e["value"]),
                F.lit('"'),
            ),
        ),
        ",",
    )
    return F.concat(F.lit("{"), body, F.lit("}"))


def format_welf(**fields: Column) -> Column:
    """$(format-welf) — space-separated k=v pairs, values stringified."""
    pairs = [F.concat(F.lit(k + "="), c.cast("string")) for k, c in fields.items()]
    return F.concat_ws(" ", *pairs)


def format_csv(*cols: Column, sep: str = ",") -> Column:
    """CSV rendering of columns (template-driven file destinations)."""
    return F.concat_ws(sep, *[c.cast("string") for c in cols])


def format_cef(
    device_vendor: str,
    device_product: str,
    device_version: str,
    signature_id: Column,
    name: Column,
    severity: Column,
    **extensions: Column,
) -> Column:
    """$(format-cef-extension)-style CEF rendering (reference:
    modules/cef/format-cef-extension.c): header fields pipe-separated,
    extensions as space-separated k=v."""
    header = F.concat_ws(
        "|",
        F.lit("CEF:0"),
        F.lit(device_vendor),
        F.lit(device_product),
        F.lit(device_version),
        signature_id.cast("string"),
        name.cast("string"),
        severity.cast("string"),
    )
    ext = F.concat_ws(" ", *[F.concat(F.lit(k + "="), c.cast("string")) for k, c in extensions.items()])
    return F.concat(header, F.lit("|"), ext)


def stardate(ts: Column, digits: int = 2) -> Column:
    """$(stardate) (reference: modules/stardate) — year + elapsed-year
    fraction, e.g. 2024.08. Deterministic calendar arithmetic."""
    year = F.year(ts)
    start = F.make_date(year, F.lit(1), F.lit(1)).cast("timestamp")
    end = F.make_date(year + 1, F.lit(1), F.lit(1)).cast("timestamp")
    frac = (epoch_seconds(ts) - epoch_seconds(start)) / (
        epoch_seconds(end) - epoch_seconds(start)
    )
    return F.round(year + frac, digits)
