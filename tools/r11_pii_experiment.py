"""Round-11 measurement: fused single-pass PII scrub vs the r10
chained form (SCALE.md Addendum 17).

r10 (Addendum 16) measured the CHAINED scrubber — one regexp_replace
pass per category plus one regexp_count per category for the audit
counts — at ~1.5 MB/s/core for the full set. r11 fuses the four regex
categories into one alternation scan (operators/pii.py pii_matches):
redaction is extract-once + per-match classify + literal-replace
fold, and the counts CLASSIFY the same extracted matches instead of
re-scanning the corpus. This tool measures both implementations on
the same raw documents.text (repartition(32), min-of-2 noop writes)
so the speedup is a number, not an argument. The chained form is
reconstructed inline below exactly as pii.py r10 had it.

Usage: python tools/r11_pii_experiment.py OUT.json SF_DIR [SF_DIR...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Column, DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from syslog_ng_spark.catalog import T  # noqa: E402
from syslog_ng_spark.operators.pii import (  # noqa: E402
    PII_PATTERNS,
    _CC_TOKEN,
    cc_candidates,
    pii_redact,
)
from syslog_ng_spark.session import get_session  # noqa: E402


def timed(fn, runs: int = 3) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 2)


# ---- the r10 CHAINED implementation, verbatim semantics -----------------


def chained_redact_col(text: Column) -> Column:
    out = F.aggregate(
        cc_candidates(text),
        text,
        lambda acc, cand: F.replace(acc, cand, F.lit(_CC_TOKEN)),
    )
    for _name, (pat, tok) in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, tok)
    return out


def chained_counts(text: Column) -> dict[str, Column]:
    out = {
        name: F.regexp_count(text, F.lit(pat)).cast("long")
        for name, (pat, _tok) in PII_PATTERNS.items()
    }
    out["credit_card"] = F.size(cc_candidates(text)).cast("long")
    return out


def chained_redact(df: DataFrame, col: str) -> DataFrame:
    out = df
    for name, c in chained_counts(F.col(col)).items():
        out = out.withColumn(f"pii_{name}", c)
    return out.withColumn(col, chained_redact_col(F.col(col)))


def main() -> None:
    out_path, sf_dirs = sys.argv[1], sys.argv[2:]
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for sf_dir in sf_dirs:
        docs = T(spark, sf_dir, "documents")
        n_docs = docs.count()  # warm listing
        text_bytes = docs.select(F.sum(F.octet_length("text"))).collect()[0][0] or 0
        wide = docs.select("doc_id", F.col("text").alias("_t")).repartition(32)

        t_chained = timed(
            lambda: chained_redact(wide, "_t")
            .write.format("noop").mode("overwrite").save()
        )
        t_chained_noc = timed(
            lambda: wide.withColumn("_t", chained_redact_col(F.col("_t")))
            .write.format("noop").mode("overwrite").save()
        )
        t_fused = timed(
            lambda: pii_redact(wide, "_t", with_counts=True)
            .write.format("noop").mode("overwrite").save()
        )
        t_fused_noc = timed(
            lambda: pii_redact(wide, "_t", with_counts=False)
            .write.format("noop").mode("overwrite").save()
        )
        mb = text_bytes / 1e6
        entry = {
            "dir": sf_dir,
            "docs": n_docs,
            "mb": round(mb, 1),
            "chained_counts_sec": t_chained,
            "chained_redact_only_sec": t_chained_noc,
            "fused_counts_sec": t_fused,
            "fused_redact_only_sec": t_fused_noc,
            "chained_mb_per_sec": round(mb / t_chained, 1) if t_chained else None,
            "fused_mb_per_sec": round(mb / t_fused, 1) if t_fused else None,
            "speedup_counts": round(t_chained / t_fused, 2) if t_fused else None,
            "speedup_redact_only": (
                round(t_chained_noc / t_fused_noc, 2) if t_fused_noc else None
            ),
        }
        results.append(entry)
        print(json.dumps(entry))
    Path(out_path).write_text(json.dumps(results, indent=1) + "\n")


if __name__ == "__main__":
    main()
