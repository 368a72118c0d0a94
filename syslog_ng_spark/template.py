"""syslog-ng template-string compiler: template text → Spark Column.

The reference's primary user surface is the template string —
``"<$PRI>$ISODATE $HOST $MSGHDR$MSG $(sha1 $MSG)"`` — tokenized by
lib/template/compiler.c, evaluated by lib/template/eval.c, with macro
names from lib/template/macros.c and functions from
modules/basicfuncs/*.c. Behavior here is modeled on the reference's
own tests (lib/template/tests/test_template.c):

- ``$NAME`` (longest [A-Za-z0-9_] run) and ``${NAME}`` value refs;
  braced names may contain dots (``${APP.VALUE}`` → sdata lookup).
- ``${NAME:-default}`` default when the value is unset; the default
  text is itself a template.
- ``$$`` renders a literal ``$``; a ``$`` not followed by a valid
  name/brace/paren stays literal (``$}`` → "$}").
- ``$(func arg ...)`` template functions: args split on whitespace
  (newlines included), quoted with ' or " to carry spaces, and every
  arg is itself a template (nesting expands inside quotes, matching
  test_template.c's ``$(echo '$(echo $HOST)')`` cases).
- unbalanced ``${`` or ``$(`` is a compile error; an unbalanced
  CLOSING brace/paren is literal text.
- unset/missing values render as '' (LogMessage semantics); a name
  absent from the DataFrame schema is unset, not an analysis error.

Compilation is declarative: the result is ONE Column expression
(concat of parts), fully JVM-side — Catalyst sees through it, so a
compiled template costs the same as the hand-written expression and
stays inside whole-stage codegen. No UDFs anywhere.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from syslog_ng_spark.datamodel import facility_name, pri, severity_name
from syslog_ng_spark.functions import macros
from syslog_ng_spark.functions.fname import basename, dirname
from syslog_ng_spark.functions.hashfuncs import stable_uuid, tf_hash, tf_md5, tf_sha1, tf_sha256
from syslog_ng_spark.functions.ipfuncs import ipv4_to_int
from syslog_ng_spark.functions.strfuncs import (
    indent_multi_line,
    padding,
    replace_delimiter,
    sanitize,
    substr,
)
from syslog_ng_spark.functions.urlfuncs import base64_encode, url_decode, url_encode


class TemplateCompileError(ValueError):
    """Raised for the syntax errors the reference rejects at compile
    time (unbalanced '${' / '$(', unknown function)."""


# ---------------------------------------------------------------------------
# parser → AST
#   ("lit", text)
#   ("val", name, default_parts | None)
#   ("fn", name, [args])  where an arg is ("tpl", parts) or ("cond", raw)
# ---------------------------------------------------------------------------

_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|\d+")
_FN_NAME_RE = re.compile(r"[A-Za-z0-9_*+/%-]+")


def parse_template(text: str) -> list:
    parts: list = []
    lit: list[str] = []
    i, n = 0, len(text)

    def flush():
        if lit:
            parts.append(("lit", "".join(lit)))
            lit.clear()

    while i < n:
        ch = text[i]
        if ch != "$":
            lit.append(ch)
            i += 1
            continue
        if i + 1 >= n:
            lit.append("$")
            break
        nxt = text[i + 1]
        if nxt == "$":
            lit.append("$")
            i += 2
        elif nxt == "{":
            end = text.find("}", i + 2)
            if end < 0:
                raise TemplateCompileError("'}' is missing")
            inner = text[i + 2 : end]
            flush()
            if ":-" in inner:
                name, default = inner.split(":-", 1)
                parts.append(("val", name, parse_template(default)))
            else:
                parts.append(("val", inner, None))
            i = end + 1
        elif nxt == "(":
            node, i = _parse_fn(text, i + 2)
            flush()
            parts.append(node)
        else:
            m = _NAME_RE.match(text, i + 1)
            if m:
                flush()
                parts.append(("val", m.group(0), None))
                i = m.end()
            else:
                lit.append("$")
                i += 1
    flush()
    return parts


def _parse_fn(text: str, i: int) -> tuple[tuple, int]:
    """Parse 'name arg ... )' starting just after '$('; returns the fn
    node and the index after the closing ')'."""
    m = _FN_NAME_RE.match(text, i)
    if not m:
        raise TemplateCompileError("missing function name or imbalanced '('")
    name, i = m.group(0), m.end()
    args: list = []
    n = len(text)
    while True:
        while i < n and text[i] in " \t\n\r":
            i += 1
        if i >= n:
            raise TemplateCompileError("missing function name or imbalanced '('")
        if text[i] == ")":
            return ("fn", name, args), i + 1
        if text[i] in "'\"":
            quote, j, buf = text[i], i + 1, []
            while j < n and text[j] != quote:
                if text[j] == "\\" and j + 1 < n:
                    buf.append(text[j + 1])
                    j += 2
                else:
                    buf.append(text[j])
                    j += 1
            if j >= n:
                raise TemplateCompileError("missing function name or imbalanced '('")
            args.append(("tpl", parse_template("".join(buf))))
            i = j + 1
        elif text[i] == "(":
            j, depth = i + 1, 1
            while j < n and depth:
                if text[j] == "(":
                    depth += 1
                elif text[j] == ")":
                    depth -= 1
                j += 1
            if depth:
                raise TemplateCompileError("missing function name or imbalanced '('")
            args.append(("cond", text[i + 1 : j - 1]))
            i = j
        else:
            # bare word: runs to whitespace or this fn's ')', but a
            # nested $(...) or ${...} inside is carried whole
            j, buf = i, []
            while j < n and text[j] not in " \t\n\r)":
                if text[j] == "$" and j + 1 < n and text[j + 1] == "(":
                    k, depth = j + 2, 1
                    while k < n and depth:
                        if text[k] == "(":
                            depth += 1
                        elif text[k] == ")":
                            depth -= 1
                        k += 1
                    if depth:
                        raise TemplateCompileError("missing function name or imbalanced '('")
                    buf.append(text[j:k])
                    j = k
                elif text[j] == "$" and j + 1 < n and text[j + 1] == "{":
                    k = text.find("}", j + 2)
                    if k < 0:
                        raise TemplateCompileError("'}' is missing")
                    buf.append(text[j : k + 1])
                    j = k + 1
                else:
                    buf.append(text[j])
                    j += 1
            args.append(("tpl", parse_template("".join(buf))))
            i = j


# ---------------------------------------------------------------------------
# hard macros over the canonical log schema
# (reference: lib/template/macros.c macro table)
# ---------------------------------------------------------------------------

MACROS: dict[str, Callable[[], Column]] = {
    "ISODATE": lambda: macros.isodate(F.col("ts")),
    "FULLDATE": lambda: macros.fulldate(F.col("ts")),
    "DATE": lambda: macros.date(F.col("ts")),
    "STAMP": lambda: macros.date(F.col("ts")),
    "YEAR": lambda: macros.year(F.col("ts")),
    "MONTH": lambda: macros.month(F.col("ts")),
    "DAY": lambda: macros.day(F.col("ts")),
    "HOUR": lambda: macros.hour(F.col("ts")),
    "MIN": lambda: macros.minute(F.col("ts")),
    "SEC": lambda: macros.sec(F.col("ts")),
    "WEEK_DAY": lambda: macros.week_day(F.col("ts")).cast("string"),
    "UNIXTIME": lambda: macros.unixtime(F.col("ts")).cast("string"),
    "FACILITY": lambda: facility_name(F.col("facility")),
    "FACILITY_NUM": lambda: F.col("facility").cast("string"),
    "SEVERITY": lambda: severity_name(F.col("severity")),
    "PRIORITY": lambda: severity_name(F.col("severity")),
    "LEVEL": lambda: severity_name(F.col("severity")),
    "SEVERITY_NUM": lambda: F.col("severity").cast("string"),
    "LEVEL_NUM": lambda: F.col("severity").cast("string"),
    "PRI": lambda: pri(F.col("facility"), F.col("severity")).cast("string"),
    "MSGHDR": lambda: macros.msghdr(F.col("program"), F.col("pid")),
    "MSG": lambda: F.col("message"),
    "MESSAGE": lambda: F.col("message"),
    "HOST": lambda: F.col("host"),
    "PROGRAM": lambda: F.col("program"),
    "PID": lambda: F.col("pid").cast("string"),
    "TAGS": lambda: F.array_join(F.col("tags"), ","),
    # name/number date variants (macros.c M_* table)
    "MONTH_ABBREV": lambda: F.date_format(F.col("ts"), "MMM"),
    "MONTH_NAME": lambda: F.date_format(F.col("ts"), "MMMM"),
    "YEAR_DAY": lambda: F.date_format(F.col("ts"), "DDD"),
    "WEEKDAY": lambda: F.date_format(F.col("ts"), "EEE"),
    "WEEK_DAY_NAME": lambda: F.date_format(F.col("ts"), "EEEE"),
    "WEEK_DAY_ABBREV": lambda: F.date_format(F.col("ts"), "EEE"),
    # M_WEEK: zero-based week with Monday-start weeks (macros.c:
    # (yday - (wday-1+7)%7 + 7) / 7 with tm's 0-based fields)
    "WEEK": lambda: F.lpad(
        (
            (
                F.dayofyear(F.col("ts"))
                - 1
                - F.pmod(F.dayofweek(F.col("ts")) - 2 + 7, 7)
                + 7
            )
            / 7
        )
        .cast("int")
        .cast("string"),
        2,
        "0",
    ),
    "HOUR12": lambda: F.date_format(F.col("ts"), "hh"),
    "AMPM": lambda: F.date_format(F.col("ts"), "a"),
    "TZOFFSET": lambda: F.lit("+00:00"),  # session TZ is UTC
    "TZ": lambda: F.lit("+00:00"),
    "FULLHOST": lambda: F.col("host"),
    "HOST_FROM": lambda: F.col("host"),
    "FULLHOST_FROM": lambda: F.col("host"),
}

# S_* (stamp) and R_* (received) prefixed date macros: the reference
# tracks both timestamps per message (logmsg.h); the batch model has
# one event time, so both families resolve to `ts` — the documented
# adaptation for configs that mix them.
for _name in [
    "ISODATE", "FULLDATE", "DATE", "STAMP", "YEAR", "MONTH", "DAY",
    "HOUR", "MIN", "SEC", "WEEK", "WEEK_DAY", "WEEKDAY", "YEAR_DAY",
    "MONTH_ABBREV", "MONTH_NAME", "WEEK_DAY_NAME", "WEEK_DAY_ABBREV",
    "UNIXTIME", "TZOFFSET", "TZ",
]:
    MACROS[f"S_{_name}"] = MACROS[_name]
    MACROS[f"R_{_name}"] = MACROS[_name]


def schema_resolver(columns: list[str]) -> Callable[[str], Column | None]:
    """Resolver over a known schema: hard macros first, then exact
    column names, then dotted NV names via the `sdata` map. Names that
    resolve to nothing are UNSET (render '' / take the :-default) —
    like logmsg's nv-table, and unlike a bare F.col() which would blow
    up analysis on a missing column."""
    cols = set(columns)

    def resolve(name: str) -> Column | None:
        if name in MACROS:
            return MACROS[name]()
        if name in cols:
            return F.col(name).cast("string")
        if "sdata" in cols:  # NV pairs (incl. dotted names) live in the map
            return F.col("sdata").getItem(name)
        return None

    return resolve


# ---------------------------------------------------------------------------
# template functions (modules/basicfuncs/*.c)
# Each handler receives `args`: a list of Arg(col, lit) where .col is
# the evaluated string Column and .lit is the python string when the
# arg was a pure literal (for offset/width params), else None.
# ---------------------------------------------------------------------------


class Arg:
    __slots__ = ("col", "lit")

    def __init__(self, col: Column, lit: str | None):
        self.col = col
        self.lit = lit

    def int_lit(self, what: str) -> int:
        if self.lit is None:
            raise TemplateCompileError(f"$({what}) parameter must be a literal integer")
        return int(self.lit)


def _num(a: Arg) -> Column:
    # try_cast, never cast: ANSI mode (Spark 4 default) turns a single
    # malformed value into a job-killing CAST_INVALID_INPUT; the
    # reference renders unset instead, which null -> '' gives us
    return a.col.try_cast("long")


def _arith(op) -> Callable:
    return lambda args: op(_num(args[0]), _num(args[1])).try_cast("long").cast("string")


def _tf_round(args: list[Arg]) -> Column:
    # numeric-funcs.c $(round value [frac-digits])
    digits = args[1].int_lit("round") if len(args) > 1 else 0
    val = args[0].col.try_cast("double")
    if digits <= 0:
        return F.round(val, 0).try_cast("long").cast("string")
    return F.when(
        val.isNotNull(), F.format_string(f"%.{digits}f", F.round(val, digits))
    )


def _tf_substr(args: list[Arg]) -> Column:
    start = args[1].int_lit("substr")
    length = args[2].int_lit("substr") if len(args) > 2 else None
    return substr(args[0].col, start, length)


def _tf_padding(args: list[Arg]) -> Column:
    width = args[1].int_lit("padding")
    fill = args[2].lit if len(args) > 2 and args[2].lit is not None else " "
    return padding(args[0].col, width, fill)


def _list_col(args: list[Arg]) -> Column:
    """list funcs take comma-separated list strings (list-funcs.c);
    multiple args concatenate into one list."""
    return F.concat_ws(",", *[a.col for a in args])


def _tf_json_escape(c: Column) -> Column:
    # same single-pass escape as functions.format._json_escape (kept
    # local: format.py imports this module's compiler for $(format-json)
    # args)
    return F.regexp_replace(c, r'([\\"])', r"\\$1")


FUNCTIONS: dict[str, Callable[[list[Arg]], Column]] = {
    "echo": lambda a: F.concat_ws(" ", *[x.col for x in a]) if a else F.lit(""),
    "lowercase": lambda a: F.lower(a[0].col),
    "uppercase": lambda a: F.upper(a[0].col),
    "strip": lambda a: F.trim(a[0].col),
    "length": lambda a: F.length(a[0].col).cast("string"),
    "basename": lambda a: basename(a[0].col),
    "dirname": lambda a: dirname(a[0].col),
    "md5": lambda a: tf_md5(F.concat(*[x.col for x in a])),
    "sha1": lambda a: tf_sha1(F.concat(*[x.col for x in a])),
    "sha256": lambda a: tf_sha256(F.concat(*[x.col for x in a])),
    "hash": lambda a: tf_hash(F.concat(*[x.col for x in a])),
    "uuid": lambda a: stable_uuid(*[x.col for x in a]) if a else stable_uuid(F.lit("")),
    "url-encode": lambda a: url_encode(a[0].col),
    "url-decode": lambda a: url_decode(a[0].col),
    "base64-encode": lambda a: base64_encode(F.concat(*[x.col for x in a])),
    "ipv4-to-int": lambda a: ipv4_to_int(a[0].col).cast("string"),
    "sanitize": lambda a: sanitize(a[0].col),
    # escape a rendered value for embedding inside a hand-built JSON
    # string literal (the escaping $(format-json) applies to values) —
    # elasticsearch_http routes macro-bearing _index/_id through this
    "json-escape": lambda a: _tf_json_escape(
        a[0].col if len(a) == 1 else F.concat_ws(" ", *[x.col for x in a])
    ),
    "indent-multi-line": lambda a: indent_multi_line(a[0].col),
    "replace-delimiter": lambda a: replace_delimiter(
        a[2].col, a[0].lit or "", a[1].lit or ""
    ),
    "+": _arith(lambda x, y: x + y),
    "-": _arith(lambda x, y: x - y),
    "*": _arith(lambda x, y: x * y),
    # try_divide: /0 renders unset, not DIVIDE_BY_ZERO; cast truncates
    "/": _arith(F.try_divide),
    "%": _arith(lambda x, y: F.when(y != 0, F.pmod(x, y))),
    "round": _tf_round,
    "ceil": lambda a: F.ceil(a[0].col.try_cast("double")).try_cast("long").cast("string"),
    "floor": lambda a: F.floor(a[0].col.try_cast("double")).try_cast("long").cast("string"),
    "substr": _tf_substr,
    "padding": _tf_padding,
    "list-head": lambda a: F.element_at(F.split(_list_col(a), ","), 1),
    "list-tail": lambda a: F.array_join(
        F.slice(
            F.split(_list_col(a), ","),
            2,
            F.greatest(F.size(F.split(_list_col(a), ",")) - 1, F.lit(0)),
        ),
        ",",
    ),
    "list-count": lambda a: F.when(_list_col(a) == "", F.lit(0))
    .otherwise(F.size(F.split(_list_col(a), ",")))
    .cast("string"),
    # list-funcs.c tf_list_nth: the INDEX is the first argument; an
    # out-of-range index renders unset (try_element_at, not the
    # ANSI-crashing element_at)
    "list-nth": lambda a: F.try_element_at(
        F.split(_list_col(a[1:]), ","), F.lit(a[0].int_lit("list-nth") + 1)
    ),
}


# ---------------------------------------------------------------------------
# $(if (cond) a b) condition language — cond-funcs.c + filter-cmp.c:
# symbolic ops (== < …) compare numerically when both sides are
# numbers, else as strings; word ops (eq lt …) always compare strings.
# ---------------------------------------------------------------------------

_COND_RE = re.compile(
    r"""\s*(?:"([^"]*)"|'([^']*)'|([^\s<>=!]+))\s*"""
    r"""(==|!=|<=|>=|<|>|eq|ne|lt|le|gt|ge)"""
    r"""\s*(?:"([^"]*)"|'([^']*)'|(.+?))\s*$"""
)

_CMP = {
    "eq": lambda a, b: a == b,
    "ne": lambda a, b: a != b,
    "lt": lambda a, b: a < b,
    "le": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "ge": lambda a, b: a >= b,
}
_SYM = {"==": "eq", "!=": "ne", "<": "lt", "<=": "le", ">": "gt", ">=": "ge"}


class TemplateCompiler:
    """Compiles template strings to Columns. `resolver` maps a value
    name to a Column or None (= unset); build one with
    `schema_resolver(df.columns)` or pass your own. With
    `escape=True`, substituted VALUES (not literal text) get " \\ '
    backslash-escaped — the reference's template escape option for
    rendering into quoted contexts (lib/template/escaping.c,
    test_template.c test_escaping)."""

    def __init__(self, resolver: Callable[[str], Column | None], escape: bool = False):
        self.resolver = resolver
        self.escape = escape

    def compile(self, template: str) -> Column:
        return self._parts_col(parse_template(template))

    def _escaped(self, c: Column) -> Column:
        if not self.escape:
            return c
        return F.regexp_replace(c, r"""([\\"'])""", r"\\$1")

    def _parts_col(self, parts: list) -> Column:
        if not parts:
            return F.lit("")
        cols = [self._part(p) for p in parts]
        return cols[0] if len(cols) == 1 else F.concat(*cols)

    def _part(self, node) -> Column:
        kind = node[0]
        if kind == "lit":
            return F.lit(node[1])
        if kind == "val":
            _, name, default = node
            val = self.resolver(name)
            if val is None:
                return self._parts_col(default) if default is not None else F.lit("")
            val = self._escaped(val.cast("string"))
            fallback = self._parts_col(default) if default is not None else F.lit("")
            return F.coalesce(val, fallback)
        if kind == "fn":
            return F.coalesce(self._escaped(self._fn(node).cast("string")), F.lit(""))
        raise TemplateCompileError(f"unknown node {kind}")

    def _fn(self, node) -> Column:
        _, name, raw_args = node
        if name == "if":
            return self._fn_if(raw_args)
        if name in ("format-json", "format-welf"):
            return self._fn_format(name, raw_args)
        if name == "or":
            vals = [self._arg_col(a) for a in raw_args]
            cleaned = [F.when((c.isNotNull()) & (c != ""), c) for c in vals]
            return F.coalesce(*cleaned, F.lit(""))
        handler = FUNCTIONS.get(name)
        if handler is None:
            raise TemplateCompileError(f"unknown template function $({name})")
        return handler([self._arg(a) for a in raw_args])

    def _arg(self, arg) -> Arg:
        if arg[0] != "tpl":
            raise TemplateCompileError("parenthesized argument only valid in $(if)")
        parts = arg[1]
        lit = None
        if len(parts) == 0:
            lit = ""
        elif len(parts) == 1 and parts[0][0] == "lit":
            lit = parts[0][1]
        # escaping applies ONLY at the outermost substitution
        # (escaping.c wraps log_template_format, not argument eval)
        saved, self.escape = self.escape, False
        try:
            col = self._parts_col(parts)
        finally:
            self.escape = saved
        return Arg(col, lit)

    def _arg_col(self, arg) -> Column:
        return self._arg(arg).col

    def _fn_format(self, name: str, raw_args) -> Column:
        """$(format-json --scope S --key G --exclude G --add-prefix P
        k=$V ...) and $(format-welf k=$V ...): option flags must be
        literals; explicit k=v pairs compile their value side as a
        template (modules/json/format-json.c option grammar)."""
        opts: dict[str, object] = {}
        pairs: list[tuple[str, Column]] = []
        i = 0
        while i < len(raw_args):
            arg = raw_args[i]
            a = self._arg(arg)
            if a.lit is not None and a.lit.startswith("--"):
                flag = a.lit[2:]
                if i + 1 >= len(raw_args):
                    raise TemplateCompileError(f"--{flag} needs a value")
                val = self._arg(raw_args[i + 1])
                if val.lit is None:
                    raise TemplateCompileError(f"--{flag} value must be literal")
                if flag == "scope":
                    opts["scope"] = val.lit
                elif flag == "key":
                    opts.setdefault("key", []).append(val.lit)  # type: ignore[union-attr]
                elif flag == "exclude":
                    opts.setdefault("exclude", []).append(val.lit)  # type: ignore[union-attr]
                elif flag == "add-prefix":
                    opts["rekey_add_prefix"] = val.lit
                elif flag == "shift":
                    opts["rekey_shift"] = int(val.lit)
                else:
                    raise TemplateCompileError(f"unknown option --{flag}")
                i += 2
                continue
            if a.lit is not None and "=" in a.lit:
                k, v = a.lit.split("=", 1)
                pairs.append((k, self._parts_col(parse_template(v))))
            elif arg[0] == "tpl":
                # k=$V where the value is a ref: re-render from raw parts
                parts = arg[1]
                if parts and parts[0][0] == "lit" and "=" in parts[0][1]:
                    k, rest = parts[0][1].split("=", 1)
                    tail = ([("lit", rest)] if rest else []) + parts[1:]
                    pairs.append((k, self._parts_col(tail)))
                else:
                    raise TemplateCompileError(f"$({name}) argument must be k=v or --opt")
            i += 1
        from syslog_ng_spark.functions.format import (
            format_json,
            format_json_scoped,
            format_welf,
            value_pairs,
        )

        core = dict(pairs)
        if opts:
            # scoped selection draws from the canonical sdata NV map;
            # --key without --scope selects ONLY the key matches
            # (value-pairs.c: an explicit key is its own selection);
            # explicit k=v args ride as unconditional --pair entries
            opts.setdefault("scope", "none")
            if name == "format-welf":
                # welf shares the value-pairs option grammar: render
                # the selected map as sorted k=v pairs
                m = value_pairs(F.col("sdata"), pairs=core, **opts)  # type: ignore[arg-type]
                return F.array_join(
                    F.transform(
                        F.array_sort(F.map_entries(m)),
                        lambda e: F.concat(e["key"], F.lit("="), e["value"]),
                    ),
                    " ",
                )
            return format_json_scoped(F.col("sdata"), pairs=core, **opts)  # type: ignore[arg-type]
        if name == "format-welf":
            return format_welf(**core)
        return format_json(**core)

    def _fn_if(self, raw_args) -> Column:
        if len(raw_args) != 3 or raw_args[0][0] != "cond":
            raise TemplateCompileError("$(if) needs (cond) true-value false-value")
        cond = self._cond(raw_args[0][1])
        return F.when(cond, self._arg_col(raw_args[1])).otherwise(self._arg_col(raw_args[2]))

    def _cond(self, text: str) -> Column:
        m = _COND_RE.match(text)
        if not m:
            raise TemplateCompileError(f"cannot parse condition: {text!r}")
        lq, lsq, lbare, op, rq, rsq, rbare = m.groups()
        # conditions compare raw values — escaping is an output
        # concern and must not affect the comparison
        saved, self.escape = self.escape, False
        try:
            left = self._parts_col(
                parse_template(lq if lq is not None else lsq if lsq is not None else lbare)
            )
            right = self._parts_col(
                parse_template(rq if rq is not None else rsq if rsq is not None else rbare)
            )
        finally:
            self.escape = saved
        if op in _CMP:
            return _CMP[op](left, right)
        # try_cast, not cast: ANSI mode throws on non-numeric strings,
        # and "numeric if both sides are numbers" needs a null probe
        ln, rn = left.try_cast("double"), right.try_cast("double")
        both_num = ln.isNotNull() & rn.isNotNull()
        return F.when(both_num, _CMP[_SYM[op]](ln, rn)).otherwise(_CMP[_SYM[op]](left, right))


def compile_template(
    template: str, df: DataFrame | None = None, escape: bool = False
) -> Column:
    """Compile a syslog-ng template string to one string Column.

    With `df`, unknown names resolve as unset ('' / the :-default)
    against that schema; without, names beyond the macro table resolve
    to bare columns (missing ones fail at analysis, like referencing a
    missing column by hand). `escape=True` backslash-escapes
    substituted values (the reference's escape option)."""
    if df is not None:
        resolver = schema_resolver(df.columns)
    else:

        def blind(name: str) -> Column | None:
            if name in MACROS:
                return MACROS[name]()
            return F.col(name).cast("string")

        resolver = blind
    return TemplateCompiler(resolver, escape=escape).compile(template)


def template_format(df: DataFrame, template: str, target: str = "rendered") -> DataFrame:
    """rewrite/sink helper: render `template` per row into `target` —
    the engine-level equivalent of a template() in a destination."""
    return df.withColumn(target, compile_template(template, df))
