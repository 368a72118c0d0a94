"""Measure the CAPPED variants of the quadratic near-dup family at
sf0.1 / sf1 / sf10 — the round-4 verdict's task 5: the uncapped
queries (dedup_jaccard, dup_clusters, embed_neardup, simhash_neardup)
are provably quadratic on the degenerate fixed-vocab synthetic corpus
and benched only to sf1; the capped variants are the 100 TB recipe and
must demonstrate bounded growth at sf10.

Measured (min of N runs, noop sink, clearCache between runs — bench.py
methodology):
- simhash_neardup_scale   (60-bit, bucket_cap=1000)      — simhash capped
- dup_clusters_capped     (components over capped edges) — CC capped
- dedup_minhash_lsh_capped(bucket_cap)                   — LSH capped
- semantic_dedup_scan     (frozen quantizer, cell-pruned) — embed family
                            scale path (embed_neardup is its exact baseline)
- jaccard_cap_engaged     jaccard_pairs with df_cap=500: the synthetic
  corpus's mean shingle df grows to ~830 at sf10, JUST UNDER the
  default df_cap=1000 — so the default cap stops pruning exactly when
  the corpus saturates (measured: 11.7B candidate instances). A cap
  below the degenerate mode (500) re-engages the bound. Real corpora
  don't sit every shingle at the same df; the honest conclusion is
  that df_cap must be set below the corpus's boilerplate mode, and
  the telemetry to check that is one cheap groupBy (see
  tools/scale_experiment.py pair_instances).

Usage: python tools/capped_scale_experiment.py OUT.json SF_DIR [SF_DIR ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    out_path = sys.argv[1]
    sf_dirs = sys.argv[2:]
    n_runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2"))

    from syslog_ng_spark.catalog import QUERIES, T
    from syslog_ng_spark.operators import dedup
    from syslog_ng_spark.session import get_session

    spark = get_session("capped-scale")
    spark.sparkContext.setLogLevel("ERROR")

    def jaccard_cap_engaged(spark, sf_dir):
        docs = T(spark, sf_dir, "documents")
        return dedup.jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.8, df_cap=500)

    targets = {
        "simhash_neardup_scale": QUERIES["simhash_neardup_scale"],
        "dup_clusters_capped": QUERIES["dup_clusters_capped"],
        "dedup_minhash_lsh_capped": QUERIES["dedup_minhash_lsh_capped"],
        "semantic_dedup_scan": QUERIES["semantic_dedup_scan"],
        "jaccard_cap_engaged": jaccard_cap_engaged,
    }

    report: dict = {"n_runs": n_runs, "cpus": os.cpu_count(), "sfs": {}}
    for sf_dir in sf_dirs:
        sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
        entry: dict = {"dir": sf_dir, "timings": {}, "rows": {}}
        report["sfs"][sf] = entry
        for name, fn in targets.items():
            runs = []
            rows = None
            for _ in range(n_runs):
                t0 = time.perf_counter()
                out = fn(spark, sf_dir)
                rows = out.count()
                runs.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
            entry["timings"][name] = min(runs)
            entry["rows"][name] = rows
            print(f"sf{sf} {name}: {min(runs):.2f}s rows={rows}", file=sys.stderr)
        Path(out_path).write_text(json.dumps(report, indent=1))
    print(json.dumps(report["sfs"], indent=1))


if __name__ == "__main__":
    main()
