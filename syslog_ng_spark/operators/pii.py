"""PII detection and redaction over document/text columns.

A training-data pipeline scrubs personally identifiable information
before anything else touches the corpus. This module provides the
standard category set — email, IPv4, US-SSN, phone, credit card — as
pure Column expressions: single-pass regexp work that Catalyst keeps
inside whole-stage codegen, no UDFs, no shuffle, per-row only. At
100 TB this runs at scan speed and parallelizes with the file count.

Credit cards get a real Luhn checksum validation (mod-10, doubling
every second digit from the right), not just a digit-run regex —
digit runs alone redact order ids and timestamps. The Luhn check is
expressed with array expressions (split → reverse → indexed
transform → aggregate), still fully JVM-side; redaction of validated
candidates folds `replace` over the distinct matches
(F.aggregate over regexp_extract_all).

Related: syslog-ng's own $(cc-mask)/$(cc-hash) rewrite operators
(operators/rewrite.py, scl/rewrite) mask a KNOWN credit-card field;
this module finds PII inside free text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# category → (pattern, replacement token). Patterns are deliberately
# conservative-precision versions of the standard scrubber set
# (word-boundary anchored; phone requires separators or +CC so bare
# 10-digit ids don't match).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # scan-cost engineering on the one branch that fires at EVERY
    # letter position (the others gate on a digit): the lookbehind
    # rejects mid-word start positions in O(1) — leftmost matching
    # would pick the word start anyway, so which text matches is
    # unchanged — and the possessive local part (++) skips the
    # pointless shorter-run retries ('@' is not in the class, so the
    # maximal run is the only viable one). Together they turn a
    # per-word O(w²) reject into O(w).
    "email": (
        r"(?<![A-Za-z0-9._%+-])[A-Za-z0-9._%+-]++@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    "ipv4": (
        r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b",
        "<IP>",
    ),
    "ssn": (
        r"\b(?!000|666|9[0-9]{2})[0-9]{3}-(?!00)[0-9]{2}-(?!0000)[0-9]{4}\b",
        "<SSN>",
    ),
    "phone": (
        r"(?:\+[0-9]{1,3}[ .-]?)?(?:\([0-9]{3}\)[ .-]?|[0-9]{3}[ .-])"
        r"[0-9]{3}[ .-][0-9]{4}\b",
        "<PHONE>",
    ),
}

# 13-19 digits with optional single space/dash separators between
# groups; candidates still need the Luhn check to count as PII
_CC_CANDIDATE = r"\b(?:[0-9][ -]?){12,18}[0-9]\b"
_CC_TOKEN = "<CREDIT_CARD>"


def luhn_valid(candidate: Column) -> Column:
    """mod-10 checksum over the digit string (ISO/IEC 7812): from the
    rightmost digit, double every second one, subtract 9 when the
    double exceeds 9, sum % 10 == 0. Pure array expressions."""
    digits = F.reverse(F.split(F.regexp_replace(candidate, "[^0-9]", ""), ""))
    n = F.size(digits)
    terms = F.transform(
        digits,
        lambda d, i: F.when(
            i % 2 == 1,
            F.when(d.cast("int") * 2 > 9, d.cast("int") * 2 - 9).otherwise(
                d.cast("int") * 2
            ),
        ).otherwise(d.cast("int")),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)
    return (n >= 13) & (n <= 19) & (total % 10 == 0)


def cc_candidates(text: Column, valid_only: bool = True) -> Column:
    """Credit-card-shaped substrings; with valid_only, just the ones
    that pass Luhn."""
    cands = F.array_distinct(F.regexp_extract_all(text, F.lit(_CC_CANDIDATE), 0))
    if valid_only:
        cands = F.filter(cands, luhn_valid)
    return cands


def _alternation(cats: list[str]) -> str:
    """ONE alternation over every selected category — credit-card
    shape included — so the corpus is scanned exactly once (r11;
    SCALE.md Addendum 17 measures this against the r10 chained form
    AND against the naive two-scan fusion: Java-regex alternation
    costs roughly the sum of its branches, so the win comes from
    sharing the single scan between redaction and counts, not from
    the alternation itself). Branch order follows the CALLER's cats
    order (r12, ADVICE): where two patterns could match at the same
    position, the earlier category wins, exactly like the pre-r11
    chained regexp_replace form honored caller order. The default
    cats list puts credit_card first, preserving r11 behavior."""
    pats = []
    for n in cats:
        if n == "credit_card":
            pats.append(_CC_CANDIDATE)
        elif n in PII_PATTERNS:
            pats.append(PII_PATTERNS[n][0])
    return "|".join(pats)


def pii_matches(text: Column, cats: list[str] | None = None) -> Column:
    """Every category match (card shapes included, Luhn NOT yet
    applied) in one alternation scan, in match order, duplicates
    kept."""
    cats = ["credit_card"] + list(PII_PATTERNS) if cats is None else cats
    return F.regexp_extract_all(text, F.lit("(" + _alternation(cats) + ")"), 1)


def _is(anchored: str):
    # closure factory: F.filter/F.exists introspect lambda arity, so a
    # bound default arg would be mistaken for the index parameter
    return lambda m: m.rlike(anchored)


_CC_ANCHORED = "^(?:" + _CC_CANDIDATE + ")$"


def _match_token(m: Column, cats: list[str]) -> Column:
    """Classify one (short) matched string to its redaction token via
    anchored re-tests — per-match work, not per-corpus-char work. A
    card-shaped match that fails Luhn replaces with ITSELF (no-op),
    so order ids and timestamps survive. Precedence mirrors
    _alternation: first category in the caller's cats order wins
    (built inside-out, so the first cat wraps last = outermost)."""
    out = m
    known = [n for n in cats if n == "credit_card" or n in PII_PATTERNS]
    for name in reversed(known):
        if name == "credit_card":
            out = F.when(
                m.rlike(_CC_ANCHORED),
                F.when(luhn_valid(m), F.lit(_CC_TOKEN)).otherwise(m),
            ).otherwise(out)
        else:
            pat, tok = PII_PATTERNS[name]
            out = F.when(m.rlike("^(?:" + pat + ")$"), F.lit(tok)).otherwise(out)
    return out


def pii_counts(text: Column, matches: Column | None = None) -> dict[str, Column]:
    """category → match count, classified from the ONE extracted
    match list (pass `matches` to share the scan with redaction —
    pii_redact does)."""
    if matches is None:
        matches = pii_matches(text)
    out = {}
    for name, (pat, _tok) in PII_PATTERNS.items():
        out[name] = F.size(F.filter(matches, _is("^(?:" + pat + ")$"))).cast("long")
    cc = F.filter(matches, _is(_CC_ANCHORED))
    out["credit_card"] = F.size(F.filter(cc, luhn_valid)).cast("long")
    return out


def pii_redact_col(
    text: Column,
    categories: list[str] | None = None,
    matches: Column | None = None,
) -> Column:
    """Redact each category to its token from ONE alternation scan:
    the extracted matches classify to their tokens anchored (cheap —
    matches are short and few) and a literal-replace fold rewrites
    them longest-first, so a match that is a substring of another
    match cannot corrupt it. Card-shaped matches pass through the
    Luhn gate inside the classification.

    Caveat: the fold replaces LITERAL occurrences, so a matched
    string that also appears in a non-boundary context elsewhere in
    the same document is rewritten there too — over-redaction, never
    under-redaction of matched categories, the right failure
    direction for a scrubber."""
    cats = ["credit_card"] + list(PII_PATTERNS) if categories is None else categories
    if matches is None:
        matches = pii_matches(text, cats)
    longest_first = F.array_sort(
        F.array_distinct(matches),
        lambda a, b: F.when(F.length(a) > F.length(b), -1)
        .when(F.length(a) < F.length(b), 1)
        .otherwise(0),
    )
    return F.aggregate(
        longest_first,
        text,
        lambda acc, m: F.replace(acc, m, _match_token(m, cats)),
    )


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    categories: list[str] | None = None,
    out_col: str | None = None,
    with_counts: bool = False,
) -> DataFrame:
    """DataFrame-level redaction; with_counts adds per-category match
    counts (pre-redaction) for audit/reporting."""
    target = out_col or text_col
    cats = ["credit_card"] + list(PII_PATTERNS) if categories is None else categories
    # ONE scan: the extracted match list lands in a scratch column and
    # both the counts and the redaction fold read it — Catalyst keeps
    # the non-cheap regexp_extract_all un-inlined (CollapseProject
    # leaves multiply-referenced expensive expressions alone), so the
    # corpus is scanned once regardless of with_counts
    scratch = "_pii_matches"
    out = df.withColumn(scratch, pii_matches(F.col(text_col), cats))
    if with_counts:
        for name, c in pii_counts(F.col(text_col), matches=F.col(scratch)).items():
            if name in cats:
                out = out.withColumn(f"pii_{name}", c)
    out = out.withColumn(
        target, pii_redact_col(F.col(text_col), cats, matches=F.col(scratch))
    )
    return out.drop(scratch)
