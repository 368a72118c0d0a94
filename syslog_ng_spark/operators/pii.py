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
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
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


def pii_counts(text: Column) -> dict[str, Column]:
    """category → match count, one regexp pass per category."""
    out = {
        name: F.regexp_count(text, F.lit(pat)).cast("long")
        for name, (pat, _tok) in PII_PATTERNS.items()
    }
    out["credit_card"] = F.size(cc_candidates(text)).cast("long")
    return out


def pii_redact_col(text: Column, categories: list[str] | None = None) -> Column:
    """Redact each category to its token. Regex categories are chained
    regexp_replace (one generated-code pass each); Luhn-validated card
    numbers fold literal `replace` over the distinct valid candidates
    so invalid digit runs (order ids, timestamps) survive."""
    cats = list(PII_PATTERNS) + ["credit_card"] if categories is None else categories
    out = text
    # credit cards FIRST: an <IP>-redacted text no longer contains the
    # original card string, and some separators overlap phone patterns
    if "credit_card" in cats:
        out = F.aggregate(
            cc_candidates(out),
            out,
            lambda acc, cand: F.replace(acc, cand, F.lit(_CC_TOKEN)),
        )
    for name in cats:
        if name == "credit_card":
            continue
        pat, tok = PII_PATTERNS[name]
        out = F.regexp_replace(out, pat, tok)
    return out


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
    out = df
    if with_counts:
        for name, c in pii_counts(F.col(text_col)).items():
            out = out.withColumn(f"pii_{name}", c)
    return out.withColumn(target, pii_redact_col(F.col(text_col), categories))
