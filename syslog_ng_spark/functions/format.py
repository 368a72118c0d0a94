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
    # one regex pass, not two: prefix '\' to either special — identical
    # output to backslash-doubling-then-quote-escaping, and this runs
    # 2× per map entry in the format-json/gelf/cim hot loop (the same
    # single-pass staging that took apache_accesslog_parse 1.42→0.73s)
    return F.regexp_replace(c, r'([\\"])', r"\\$1")


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


def _json_fragment(key: str, val: Column, typed: bool) -> Column:
    """'"key":<rendered>' or NULL when the value is null/empty —
    $(format-json --omit-empty-values) semantics. `typed` renders the
    value bare (int(...) / int64(...) in the reference template);
    otherwise quoted + escaped."""
    s = val.cast("string")
    rendered = s if typed else F.concat(F.lit('"'), _json_escape(s), F.lit('"'))
    return F.when(
        s.isNotNull() & (s != ""), F.concat(F.lit(f'"{key}":'), rendered)
    )


def format_gelf(
    host: Column,
    short_message: Column,
    level_num: Column | None = None,
    r_unixtime: Column | None = None,
    program: Column | None = None,
    pid: Column | None = None,
    facility: Column | None = None,
    classifier_class: Column | None = None,
    nv: Column | None = None,
    nv_keys: list[str] | None = None,
) -> Column:
    """$(format-gelf) (reference: scl/graylog2/plugin.conf — a
    format-json template-function alias):

      $(format-json --omit-empty-values version='1.1' host='${HOST:--}'
        short_message='${MSG:--}' level=int(${LEVEL_NUM})
        timestamp=int64(${R_UNIXTIME}) _program='${PROGRAM}'
        _pid=int(${PID}) _facility='${FACILITY}'
        _class='${.classifier.class}' --key .* --key _*)

    Core fields render in the template's order (GELF consumers read
    'version' first); int()/int64() fields render bare; empty/null
    values are omitted per --omit-empty-values. The --key .*/_* extra
    NV pairs follow, '_'-prefixed per the GELF additional-field rule
    and binary-sorted (the engine's deterministic stand-in for
    insertion order, as in format_json_scoped). Pair with
    `gelf_frame` for the $(binary 0x00) TCP delimiter."""
    zero = F.lit(None).cast("string")
    frags = [
        F.lit('"version":"1.1"'),
        _json_fragment("host", F.coalesce(host.cast("string"), F.lit("-")), False),
        _json_fragment(
            "short_message", F.coalesce(short_message.cast("string"), F.lit("-")), False
        ),
        _json_fragment("level", level_num if level_num is not None else zero, True),
        _json_fragment("timestamp", r_unixtime if r_unixtime is not None else zero, True),
        _json_fragment("_program", program if program is not None else zero, False),
        _json_fragment("_pid", pid if pid is not None else zero, True),
        _json_fragment("_facility", facility if facility is not None else zero, False),
        _json_fragment("_class", classifier_class if classifier_class is not None else zero, False),
    ]
    core = F.filter(F.array(*frags), lambda x: x.isNotNull())
    if nv is not None:
        selected = F.map_filter(
            nv,
            lambda k, v: _match_any(k, nv_keys or [".*", "_*"])
            & v.isNotNull()
            & (v != ""),
        )
        extra = F.transform(
            F.array_sort(F.map_entries(selected)),
            lambda e: F.concat(
                F.lit('"'),
                _json_escape(
                    F.when(e["key"].startswith("_"), e["key"]).otherwise(
                        F.concat(F.lit("_"), e["key"])
                    )
                ),
                F.lit('":"'),
                _json_escape(e["value"]),
                F.lit('"'),
            ),
        )
        core = F.concat(core, extra)
    return F.concat(F.lit("{"), F.array_join(core, ","), F.lit("}"))


def gelf_frame(gelf: Column) -> Column:
    """$(binary 0x00) — the NUL delimiter GELF-over-TCP requires."""
    return F.concat(gelf, F.lit("\x00"))


def format_cim(
    nv: Column,
    r_isodate: Column,
    msg: Column,
) -> Column:
    """$(format-cim) (reference: scl/cim/template.conf — a format-json
    alias):

      $(format-json --pair @timestamp='${R_ISODATE}'
        --pair @message='${MSG}' --key .cim.* --shift 5 --key _*
        --key .* --replace-prefix .=_ --key *.*)\\n

    value-pairs transforms bind to the *preceding* --key batch
    (lib/value-pairs/cmdline.c: vp_cmdline_parse_rekey attaches to
    the last key), so: '.cim.*' keys lose their 5-char prefix, '_*'
    pass as-is, '.*' swap the leading '.' for '_', '*.*' pass as-is.
    Batches merge with later batches losing to earlier on key
    collision (the CIM fields win); @timestamp/@message are explicit
    --pair entries, exempt from transforms. Rendered as sorted JSON +
    '\\n' like the reference's trailing newline."""
    cim = value_pairs(nv, scope="none", key=[".cim.*"], rekey_shift=5)
    underscored = value_pairs(nv, scope="none", key=["_*"])
    dotted = value_pairs(
        nv, scope="none", key=[".*"], exclude=[".cim.*"], rekey_replace_prefix=(".", "_")
    )
    compound = value_pairs(nv, scope="none", key=["*.*"], exclude=[".*"])
    merged = _merge_maps(
        compound,
        dotted,
        underscored,
        cim,
        F.create_map(
            F.lit("@timestamp"), r_isodate.cast("string"),
            F.lit("@message"), msg.cast("string"),
        ),
    )
    entries = F.array_sort(F.map_entries(F.map_filter(merged, lambda k, v: v.isNotNull())))
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
    return F.concat(F.lit("{"), body, F.lit("}\n"))


def format_collectd(
    host: Column,
    plugin: Column,
    type_: Column,
    ts: Column,
    values: Column,
    plugin_instance: Column | None = None,
    type_instance: Column | None = None,
    interval: int | None = 60,
) -> Column:
    """collectd() destination line (reference: scl/collectd/plugin.conf —
    a unix-stream() + template wrapper):

      PUTVAL host/plugin[-plugin_instance]/type[-type_instance]
             [interval=N] UNIXTIME:values

    The reference's $(if) guards drop the '-instance' suffix when the
    instance is the empty string; NULL columns behave the same here
    (concat_ws-style skip via when()). `values` follows collectd's
    value-list syntax — callers pass 'U' or a rendered number."""
    def _seg(base: Column, inst: Column | None) -> Column:
        base = base.cast("string")
        if inst is None:
            return base
        s = inst.cast("string")
        return F.when(
            s.isNotNull() & (s != ""), F.concat(base, F.lit("-"), s)
        ).otherwise(base)

    ident = F.concat_ws(
        "/", host.cast("string"), _seg(plugin, plugin_instance), _seg(type_, type_instance)
    )
    ival = F.lit(f" interval={interval}") if interval is not None else F.lit("")
    return F.concat(
        F.lit("PUTVAL "),
        ident,
        ival,
        F.lit(" "),
        F.unix_timestamp(ts).cast("string"),
        F.lit(":"),
        values.cast("string"),
    )
