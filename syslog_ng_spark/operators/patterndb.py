"""patterndb @PARSER@ pattern syntax → regex with typed field capture.

Reference: modules/dbparser/radix.c (r_new_pnode at :595 defines the
parser vocabulary, r_parser_* the per-type match semantics; tests in
modules/dbparser/tests/test_radix.c). The reference compiles patterns
into a radix trie walked per message; the Spark-first equivalent
compiles each pattern to ONE anchored regex (literal runs escaped,
@PARSER@ segments as sub-expressions) and a ruleset to a short-circuit
CASE WHEN chain with `regexp_extract` per captured field — fully
JVM-side, codegen'd, and portable to the DuckDB oracle (plain regex
character classes only).

Pattern syntax (radix.c r_insert_node):
  literal text, with ``@@`` as a literal '@'
  ``@PARSER[:field[:param]]@`` match segments; a missing field name
  matches without capturing.

Match semantics preserved from r_parser_* (radix.c):
  NUMBER     optional '-' digits, or 0x hex        (r_parser_number)
  FLOAT      -?digits[.digits]          (DOUBLE is a deprecated alias)
  STRING     alnum run, param chars allowed too     (r_parser_string)
  ESTRING    everything up to *and consuming* the delimiter; the
             captured value excludes it; empty delimiter = rest of
             message                              (r_parser_estring_c)
  QSTRING    value between quote chars (param[0] opens, param[1] or
             param[0] closes), quotes consumed      (r_parser_qstring)
  NLSTRING   up to (not consuming) newline, CR dropped
  ANYSTRING  rest of the message
  SET        non-empty run of param chars; OPTIONALSET may be empty
  IPv4/IPv6/IPvANY, MACADDR, EMAIL, HOSTNAME, LLADDR, PCRE
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])"
_IPV4 = rf"{_OCTET}(?:\.{_OCTET}){{3}}"
_IPV6 = r"[0-9A-Fa-f:]*:[0-9A-Fa-f:.]+"
_MAC = r"(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}"


class PatternCompileError(ValueError):
    pass


def _charclass(chars: str) -> str:
    """Escape a character set for use inside [...]."""
    return re.sub(r"([\\\]\[\^\-])", r"\\\1", chars)


def _parser_regex(spec: str) -> tuple[str, str | None]:
    """One @...@ segment → (regex snippet with exactly one capturing
    group if a field name is given, field name or None)."""
    parts = spec.split(":", 2)
    ptype = parts[0]
    field = parts[1] if len(parts) > 1 and parts[1] else None
    param = parts[2] if len(parts) > 2 else None

    def grp(body: str, *, consume_after: str = "") -> str:
        inner = f"({body})" if field else f"(?:{body})"
        return inner + consume_after

    if ptype == "NUMBER":
        return grp(r"0[xX][0-9A-Fa-f]+|-?[0-9]+"), field
    if ptype in ("FLOAT", "DOUBLE"):
        return grp(r"-?[0-9]+(?:\.[0-9]+)?"), field
    if ptype == "STRING":
        extra = _charclass(param) if param else ""
        return grp(rf"[A-Za-z0-9{extra}]+"), field
    if ptype == "ESTRING":
        if param is None:
            raise PatternCompileError("Missing ESTRING parser parameters")
        if param == "":
            return grp(r".*"), field
        if len(param) == 1:
            cc = _charclass(param)
            return grp(rf"[^{cc}]*", consume_after=re.escape(param)), field
        return grp(r".*?", consume_after=re.escape(param)), field
    if ptype == "NLSTRING":
        return grp(r"[^\r\n]*"), field
    if ptype == "QSTRING":
        if param is None:
            raise PatternCompileError("Missing QSTRING parser parameters")
        op = re.escape(param[0])
        cl_raw = param[1] if len(param) > 1 else param[0]
        return op + grp(rf"[^{_charclass(cl_raw)}]*") + re.escape(cl_raw), field
    if ptype == "ANYSTRING":
        return grp(r".*"), field
    if ptype == "SET":
        if not param:
            raise PatternCompileError("Missing SET parser parameters")
        return grp(rf"[{_charclass(param)}]+"), field
    if ptype == "OPTIONALSET":
        if not param:
            raise PatternCompileError("Missing OPTIONALSET parser parameters")
        return grp(rf"[{_charclass(param)}]*"), field
    if ptype == "IPv4":
        return grp(_IPV4), field
    if ptype == "IPv6":
        return grp(_IPV6), field
    if ptype == "IPvANY":
        return grp(rf"{_IPV4}|{_IPV6}"), field
    if ptype == "MACADDR":
        return grp(_MAC), field
    if ptype == "LLADDR":
        return grp(r"(?:[0-9A-Fa-f]{2}:)+[0-9A-Fa-f]{2}"), field
    if ptype == "EMAIL":
        return grp(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"), field
    if ptype == "HOSTNAME":
        return grp(r"[A-Za-z0-9.-]+"), field
    if ptype == "PCRE":
        if param is None:
            raise PatternCompileError("Missing regular expression as 3rd argument")
        # neutralize the param's own capturing groups — they would
        # shift every later field's group index (fields are extracted
        # by position)
        neutral = re.sub(r"(?<!\\)\((?!\?)", "(?:", param)
        return grp(neutral), field
    raise PatternCompileError(f"unknown @parser@ type: {ptype}")


def compile_pattern(pattern: str) -> tuple[str, list[str]]:
    """patterndb pattern string → (anchored regex, captured field
    names in group order). Matching is prefix-anchored like the radix
    walk (a pattern need not consume the whole message)."""
    out: list[str] = ["^"]
    fields: list[str] = []
    i, n = 0, len(pattern)
    lit: list[str] = []
    while i < n:
        ch = pattern[i]
        if ch != "@":
            lit.append(ch)
            i += 1
            continue
        if i + 1 < n and pattern[i + 1] == "@":
            lit.append("@")
            i += 2
            continue
        end = pattern.find("@", i + 1)
        if end < 0:
            raise PatternCompileError(f"unterminated @parser@ in {pattern!r}")
        if lit:
            out.append(re.escape("".join(lit)))
            lit.clear()
        rx, field = _parser_regex(pattern[i + 1 : end])
        out.append(rx)
        if field:
            fields.append(field)
        i = end + 1
    if lit:
        out.append(re.escape("".join(lit)))
    return "".join(out), fields


def load_patterndb_xml(xml_text: str) -> list[tuple[str, str]]:
    """Load a patterndb XML ruleset into ordered (class, pattern)
    pairs. Supports the reference's document shape
    (<patterndb><ruleset><rules><rule class=...><patterns><pattern>;
    modules/dbparser/patterndb.c pdb_rule_set_load) — one entry per
    <pattern>, document order preserved (first match wins)."""
    root = ET.fromstring(xml_text)
    rules: list[tuple[str, str]] = []
    for rule in root.iter("rule"):
        cls = rule.get("class") or rule.get("id") or "unknown"
        for pat in rule.iter("pattern"):
            if pat.text:
                rules.append((cls, pat.text))
    return rules


def patterndb_parse(
    df: DataFrame,
    col: str,
    rules: Sequence[tuple[str, str]],
    target: str = "class",
    default: str = "unknown",
) -> DataFrame:
    """Ordered first-match classification + typed field extraction.

    Each rule is (class, patterndb-pattern). Output: `target` column
    with the first matching rule's class, plus one column per captured
    field name (union over rules; '' when the matching rule doesn't
    bind the field — logmsg unset semantics). One pass, pure CASE
    WHEN + regexp_extract, codegen'd; the CASE short-circuit preserves
    the radix first-match order."""
    compiled = [(cls, *compile_pattern(p)) for cls, p in rules]
    all_fields: list[str] = []
    for _, _, fs in compiled:
        for f_ in fs:
            if f_ not in all_fields:
                all_fields.append(f_)

    c = F.col(col)
    cls_expr = None
    for cls, rx, _ in compiled:
        cond = c.rlike(rx)
        cls_expr = (
            F.when(cond, F.lit(cls)) if cls_expr is None else cls_expr.when(cond, F.lit(cls))
        )
    cls_expr = cls_expr.otherwise(F.lit(default)) if cls_expr is not None else F.lit(default)
    out = df.withColumn(target, cls_expr)

    for name in all_fields:
        expr = None
        for cls, rx, fs in compiled:
            if name not in fs:
                continue
            cond = (F.col(target) == cls) & c.rlike(rx)
            val = F.regexp_extract(c, rx, fs.index(name) + 1)
            expr = F.when(cond, val) if expr is None else expr.when(cond, val)
        out = out.withColumn(name, expr.otherwise(F.lit("")) if expr is not None else F.lit(""))
    return out
