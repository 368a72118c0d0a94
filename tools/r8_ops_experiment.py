"""Round-8 targeted measurements for SCALE.md Addendum 12.

1. bpe_train driver-local vs distributed (r7 verdict item 1): the
   distributed loop costs one Spark job round-trip PER MERGE
   (~2.2s/round, Addendum 11), which is ~18 h for a real ~30k-merge
   vocab. The driver-local path touches the corpus once (the
   `_word_profile` aggregate), collects the Heaps-law-small profile,
   and runs the incremental heap/inverted-index merge loop in pure
   Python. Measured here: distributed at 8 and 64 merges; driver-local
   at 64, 5000 and 30000 merges on the same hashed-word corpus the
   Addendum 11 BPE experiment uses (the stock 31-word documents vocab
   is degenerate for merge training). Parity at 64 merges is asserted
   inline (bit-identical merge lists), not just claimed.
2. mixture_sample at sf1/sf10 (r7 verdict item 8): the token-budgeted
   mixture sampler is zero-shuffle by construction (one tiny
   per-source agg broadcast back + an md5 keep-predicate); two points
   above sf0.1 confirm the linear law.

Usage: python tools/r8_ops_experiment.py OUT.json SF1_DIR [SF10_DIR]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from syslog_ng_spark.session import get_session  # noqa: E402
from syslog_ng_spark.operators.bpe import bpe_train  # noqa: E402
from syslog_ng_spark.operators.sampling import mixture_sample  # noqa: E402
from tools.bpe_scale_experiment import hashed_corpus  # noqa: E402


def timed(fn, runs: int = 1) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 2)


def main() -> None:
    out_path, sf1_dir = sys.argv[1], sys.argv[2]
    sf10_dir = sys.argv[3] if len(sys.argv) > 3 else None
    spark = get_session("r8-ops-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {}

    # --- 1. BPE driver-local vs distributed -------------------------------
    corpus = hashed_corpus(spark, sf1_dir).persist()
    n_docs = corpus.count()
    bpe: dict = {"sf": 1, "n_docs": n_docs}
    merges_dist = {}
    for n in (8, 64):
        merges_dist[n] = None

        def run_dist(n=n):
            merges_dist[n] = bpe_train(corpus, "text", n, driver_profile=False)

        bpe[f"distributed_{n}_sec"] = timed(run_dist)
    local_lists = {}
    for n in (64, 5000, 30000):
        local_lists[n] = None

        def run_local(n=n):
            local_lists[n] = bpe_train(corpus, "text", n, driver_profile=True)

        bpe[f"driver_local_{n}_sec"] = timed(run_local)
    assert local_lists[64] == merges_dist[64], "driver-local != distributed at 64 merges"
    bpe["parity_64_ok"] = True
    bpe["n_merges_30000_learned"] = len(local_lists[30000])
    bpe["dist_sec_per_merge_64"] = round(bpe["distributed_64_sec"] / 64, 3)
    bpe["local_sec_per_merge_30000"] = round(
        bpe["driver_local_30000_sec"] / max(len(local_lists[30000]), 1), 4
    )
    report["bpe_train"] = bpe
    corpus.unpersist()

    # --- 2. mixture_sample scale law --------------------------------------
    # same shape as the catalog gate: per-doc token counts from the
    # text column, real `source` column, fixed token budget
    from syslog_ng_spark.operators import textstats

    def mix(sf_dir: str) -> float:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        weights = {
            r["source"]: w
            for r, w in zip(
                docs.select("source").distinct().orderBy("source").collect(),
                (0.5, 0.3, 0.2, 0.1, 0.05, 0.05),
            )
        }
        t = docs.select(
            "doc_id", "source",
            textstats.token_count(F.col("text")).cast("long").alias("n_tokens"),
        )
        return timed(
            lambda: mixture_sample(
                t, "source", weights, 200_000, token_col="n_tokens", salt="mix"
            ).write.format("noop").mode("overwrite").save(),
            runs=2,
        )

    mix_report = {"sf1_sec": mix(sf1_dir)}
    if sf10_dir:
        mix_report["sf10_sec"] = mix(sf10_dir)
    report["mixture_sample"] = mix_report

    Path(out_path).write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
