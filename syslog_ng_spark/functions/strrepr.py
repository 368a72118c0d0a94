"""The str-repr quoted-string model, shared by every scanner.

Reference: lib/str-repr/decode.c + encode.c — ONE quoting convention
used by the list-scanner (template list functions), the kv-scanner
(kv-parser quoted values), and stray-word storage: values travel
'-or-"-quoted with C escapes (\\b \\f \\n \\r \\t \\\\ and the quote
kind), unknown escapes keep their backslash, and encode picks the
quote kind that avoids escaping quotes (both kinds present → wrap
in double quotes and escape the inner double quote as \\" — encode.c
passes unsafe_chars="\"" to the escaped-binary appender, which writes
backslash + char for ASCII unsafe chars).

Everything is pure Column expressions. Decode uses the \\x01 sentinel
trick for the escaped backslash so a single replace pass can't
re-interpret its own output (a literal \\x01 inside a quoted value is
the one input this mis-decodes — control chars travel \\xXX-escaped
in the reference, so it cannot appear legitimately).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# decode.c escape set; unknown escapes keep their backslash
DECODE_ESCAPES = (
    ("\\b", "\b"),
    ("\\f", "\f"),
    ("\\n", "\n"),
    ("\\r", "\r"),
    ("\\t", "\t"),
    ('\\"', '"'),
    ("\\'", "'"),
)


def is_quoted_token(tok: Column) -> Column:
    """True when `tok` is wrapped in one matching quote pair."""
    first = F.substring(tok, 1, 1)
    last = F.substring(tok, -1, 1)
    return (F.length(tok) >= 2) & (first == last) & first.isin('"', "'")


def decode_c_string(s: Column) -> Column:
    """Decode the escape set over already-unwrapped content."""
    s = F.replace(s, F.lit("\\\\"), F.lit("\x01"))
    for esc, ch in DECODE_ESCAPES:
        s = F.replace(s, F.lit(esc), F.lit(ch))
    return F.replace(s, F.lit("\x01"), F.lit("\\"))


def is_well_quoted_token(tok: Column) -> Column:
    """True only when `tok` is ONE complete quoted string — matching
    quotes AND no unescaped inner quote. A first==last check is not
    enough: the scanners' quotation-ERROR path keeps raw rest-of-input
    tokens like «'foo''bar'» that merely LOOK wrapped.

    Cost shape: NO regex — every list-op element pays this check, and
    an anchored rlike per element measured ~1.5-2× on the
    list-function gates (r11). Pure string ops instead: sentinel the
    escaped backslashes, mask the escaped quotes, then a raw
    same-kind quote inside (or a dangling trailing escape, which
    means the closing quote was escaped) disqualifies."""
    q = F.substring(tok, 1, 1)
    inner = tok.substr(F.lit(2), F.length(tok) - 2)
    s1 = F.replace(inner, F.lit("\\\\"), F.lit("\x01"))
    masked = F.replace(
        F.replace(s1, F.lit('\\"'), F.lit("\x02")), F.lit("\\'"), F.lit("\x03")
    )
    ok = (~F.contains(masked, q)) & (~masked.endswith("\\"))
    return F.when(is_quoted_token(tok), ok).otherwise(F.lit(False))


def decode_quoted_token(tok: Column) -> Column:
    """Well-quoted token → decoded content; anything else passes
    through verbatim (decode.c: only quoted values carry escapes; a
    quotation error keeps the raw text)."""
    inner = tok.substr(F.lit(2), F.length(tok) - 2)
    return F.when(is_well_quoted_token(tok), decode_c_string(inner)).otherwise(tok)


def encode_elem(v: Column) -> Column:
    """str_repr_encode with ',' forbidden (encode.c): quote when the
    value is empty or contains a comma, quote, space, backslash or
    control char; pick the quote kind that avoids escaping quotes;
    with BOTH kinds present wrap in double quotes and escape the inner
    double quote as \\" (utf8utils.c: unsafe ASCII chars emit
    backslash + char — pinned by the reference's own
    '\"\'foo,' → '"\\"\'foo,"' encode test case).

    Single-parameter BY CONTRACT: this is passed directly to
    F.transform, which arity-sniffs lambdas — a second (even
    defaulted) parameter would receive the array INDEX column."""
    forbidden = ","
    has_q = v.contains('"')
    has_a = v.contains("'")
    e = F.replace(v, F.lit("\\"), F.lit("\\\\"))
    for ch, esc in (("\b", "\\b"), ("\f", "\\f"), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")):
        e = F.replace(e, F.lit(ch), F.lit(esc))
    e_both = F.replace(e, F.lit('"'), F.lit('\\"'))
    wrapped = (
        F.when(has_q & has_a, F.concat(F.lit('"'), e_both, F.lit('"')))
        .when(has_q, F.concat(F.lit("'"), e, F.lit("'")))
        .otherwise(F.concat(F.lit('"'), e, F.lit('"')))
    )
    import re as _re

    needs_rx = "[" + _re.escape(forbidden) + "\"' \\\\\\x08\\x0c\\n\\r\\t]"
    needs = (v == "") | v.rlike(needs_rx)
    return F.when(needs, wrapped).otherwise(v)
