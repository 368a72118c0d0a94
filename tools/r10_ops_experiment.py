"""Round-10 targeted measurements for SCALE.md Addendum 15.

The round's new surface is per-row expression work — the completed
template-function registry (compiled `$(...)` chains incl. the quoted
list model's regexp tokenizer) and the PII scrubber (5 regex
categories + the Luhn fold). Both are shuffle-free by construction;
what needs MEASURING is the per-row constant — chained regexp work is
the classic way to turn a scan-speed pass into a CPU-bound one, and a
100 TB corpus pays that constant per byte.

Measured here at sf0.1 / sf1 / sf10 (events 1M→10M rows,
documents 50k→500k docs):
1. pii_redact over documents with counts (6 regexp passes + Luhn
   array fold) — wall time and MB/s over the injected-PII text.
2. the template gates exercising the new compiler paths:
   template_listops (quoted-list tokenizer), template_map_filter
   (higher-order transforms), template_context_fns (collect +
   per-element filter grammar).

Usage: python tools/r10_ops_experiment.py OUT.json SF_DIR [SF_DIR...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from syslog_ng_spark.session import get_session  # noqa: E402
from syslog_ng_spark.catalog import QUERIES, T  # noqa: E402

MEASURED = [
    "pii_redact",
    "template_listops",
    "template_map_filter",
    "template_context_fns",
]


def timed(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 2)


def main() -> None:
    out_path, sf_dirs = sys.argv[1], sys.argv[2:]
    spark = get_session()
    results: list[dict] = []
    for sf_dir in sf_dirs:
        entry: dict = {"dir": sf_dir, "timings": {}}
        # warm the file listing / JIT
        T(spark, sf_dir, "documents").count()
        for name in MEASURED:
            q = QUERIES[name]
            entry["timings"][name] = timed(
                lambda q=q: q(spark, sf_dir).write.format("noop").mode("overwrite").save()
            )
        # PII throughput basis: bytes of the scrubbed text column
        docs = T(spark, sf_dir, "documents")
        n_docs = docs.count()
        # the gate injects ~90 bytes of synthetic PII per doc on top of
        # doc_id-derived text; measure the actual redacted-input volume
        from syslog_ng_spark.operators.pii import pii_redact

        plain = docs.select(
            "doc_id", F.col("text").alias("_t")
        )
        t_plain = timed(
            lambda: pii_redact(plain, "_t", with_counts=True)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        text_bytes = docs.select(F.sum(F.octet_length("text"))).collect()[0][0] or 0
        # the generated parquet has 1M-row groups → few input splits at
        # these sfs; measure BOTH the as-read and the repartitioned
        # plan so the per-core constant and the parallel number are
        # separately visible (at 100 TB the file count provides the
        # parallelism; locally we have to ask for it)
        wide = plain.repartition(32)
        t_wide = timed(
            lambda: pii_redact(wide, "_t", with_counts=True)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        entry["pii_raw_text"] = {
            "docs": n_docs,
            "mb": round(text_bytes / 1e6, 1),
            "sec": t_plain,
            "mb_per_sec": round(text_bytes / 1e6 / t_plain, 1) if t_plain else None,
            "sec_32part": t_wide,
            "mb_per_sec_32part": round(text_bytes / 1e6 / t_wide, 1) if t_wide else None,
        }
        results.append(entry)
        print(json.dumps(entry))
    Path(out_path).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
