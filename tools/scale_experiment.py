"""Scale experiment: measure how catalog queries and dedup/ANN
candidate counts actually grow across scale factors, instead of
arguing 100 TB readiness from plan shapes at sf0.1.

Runs the bench query set at each given SF dir (min of N runs, noop
sink, cache cleared between runs — same methodology as bench.py) and
collects candidate-stage telemetry for the four near-dup pipelines:

- dedup_jaccard    candidates = doc pairs sharing >=1 surviving shingle
                   (jaccard_pairs threshold=0.0, same df_cap as catalog)
- dedup_minhash_lsh candidates = its own output (pre-verify pair set)
- simhash_neardup  candidates = bucket-collision pairs BEFORE the
                   hamming filter (max_hamming=bits keeps them all)
- embed_neardup    comparisons = n(n-1)/2 by construction (exact
                   blocked all-pairs); also counts surviving pairs

Usage:
  python tools/scale_experiment.py OUT.json SF_DIR [SF_DIR ...]
Env:
  SPARK_GRAFT_SCALE_RUNS   timing runs per query (default 2)
  SPARK_GRAFT_SCALE_SKIP   comma-list of query names to skip
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Queries whose candidate stage is provably superlinear ON THIS
# SYNTHETIC CORPUS (fixed 31-word vocab / fixed bucket space — see
# SCALE.md) get a ceiling so a 100M-candidate measurement at sf1
# doesn't become a 10G-candidate hang at sf10. Telemetry still runs;
# only the wall-time bench is skipped above the ceiling.
MAX_SF = {
    "dedup_jaccard": 1.0,
    "dup_clusters": 1.0,
    "embed_neardup": 1.0,
    "simhash_neardup": 1.0,
    "simhash_neardup_scale": 1.0,  # bench at sf10 by hand once capped
    # telemetry confirms the candidate count is tame
    "fuzzy_dedup_pipeline": 10.0,
}


def sf_of(sf_dir: str) -> float:
    return float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))


def main() -> None:
    out_path = sys.argv[1]
    sf_dirs = sys.argv[2:]
    n_runs = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2"))
    skip = set(filter(None, os.environ.get("SPARK_GRAFT_SCALE_SKIP", "").split(",")))

    from bench import BENCH_QUERIES
    from syslog_ng_spark.catalog import QUERIES, T
    from syslog_ng_spark.operators import dedup, similarity
    from syslog_ng_spark.session import get_session

    spark = get_session("scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict = {"n_runs": n_runs, "cpus": os.cpu_count(), "sfs": {}}
    for sf_dir in sf_dirs:
        sf = sf_of(sf_dir)
        entry: dict = {"dir": sf_dir, "timings": {}, "telemetry": {}}
        report["sfs"][str(sf)] = entry

        # --- wall-time bench ---------------------------------------
        QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warm footers/codegen
        for name in BENCH_QUERIES:
            if name in skip or sf > MAX_SF.get(name, float("inf")):
                continue
            runs = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(round(time.perf_counter() - t0, 3))
                spark.catalog.clearCache()
            entry["timings"][name] = min(runs)
            print(f"sf{sf} {name}: {min(runs):.3f}s", file=sys.stderr)

        # --- candidate telemetry -----------------------------------
        docs = T(spark, sf_dir, "documents")
        emb = T(spark, sf_dir, "embeddings")
        n_docs = docs.count()
        n_emb = emb.count()
        tel = entry["telemetry"]
        tel["n_docs"] = n_docs
        tel["n_emb"] = n_emb

        from pyspark.sql import functions as F

        def pair_instances(keyed, key, cap=None):
            """sum over key groups of k*(k-1)/2 — the candidate pairs the
            bucket/shingle join GENERATES (i.e. its shuffle volume),
            computable as one cheap agg at any sf without materializing
            the pairs themselves."""
            g = keyed.groupBy(key).agg(F.count(F.lit(1)).alias("k"))
            if cap:
                g = g.where(F.col("k") <= cap)
            row = g.agg(F.sum(F.expr("k * (k - 1) DIV 2"))).first()[0]
            return int(row or 0)

        sh = dedup.shingles(docs.select("doc_id", "text"), "text", n=3)
        tel["jaccard_pair_instances"] = pair_instances(sh, "shingle", cap=1000)
        sig32 = dedup.simhash(docs, "text", "doc_id", bits=32)
        b32 = sig32.select(
            F.explode(
                F.array(*[
                    F.concat_ws("_", F.lit(ci), F.expr(f"(simhash DIV {1 << (ci * 8)}) % 256"))
                    for ci in range(4)
                ])
            ).alias("bucket")
        )
        tel["simhash32_pair_instances"] = pair_instances(b32, "bucket")
        sig60 = dedup.simhash(docs, "text", "doc_id", bits=60)
        b60 = sig60.select(
            F.explode(
                F.array(*[
                    F.concat_ws("_", F.lit(ci), F.expr(f"(simhash DIV {1 << (ci * 15)}) % 32768"))
                    for ci in range(4)
                ])
            ).alias("bucket")
        )
        tel["simhash60_pair_instances"] = pair_instances(b60, "bucket")
        tel["simhash60_capped_pair_instances"] = pair_instances(b60, "bucket", cap=1000)
        msig = dedup.minhash_signatures(docs, "text", "doc_id", 16, 3)
        mband = msig.select(
            F.explode(
                F.array(*[
                    F.concat_ws(
                        "_", F.lit(bi),
                        *[F.col(f"mh_{bi * 4 + r}").cast("string") for r in range(4)],
                    )
                    for bi in range(4)
                ])
            ).alias("bucket")
        )
        tel["minhash_pair_instances"] = pair_instances(mband, "bucket")
        tel["embed_comparisons"] = n_emb * (n_emb - 1) // 2

        # SemDeDup: within-cell pair instances after IVF assignment —
        # the candidate volume of semantic_dedup vs the n^2/2 exact scan
        cents = similarity.ivf_train(emb, k=16, iters=2)
        cells = similarity.ivf_assign(emb, cents, "embedding", "_cell")
        tel["semantic_dedup_pair_instances"] = pair_instances(cells, "_cell")

        # materialized (distinct) candidate sets + surviving pairs —
        # only below the blowup ceiling
        if sf <= MAX_SF["dedup_jaccard"]:
            t0 = time.perf_counter()
            tel["jaccard_candidates"] = dedup.jaccard_pairs(
                docs, "text", "doc_id", n=3, threshold=0.0, df_cap=1000
            ).count()
            tel["jaccard_candidates_sec"] = round(time.perf_counter() - t0, 1)
            tel["jaccard_pairs_final"] = dedup.jaccard_pairs(
                docs, "text", "doc_id", n=3, threshold=0.8, df_cap=1000
            ).count()
        tel["minhash_lsh_candidates"] = dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=16, bands=4, n=3
        ).count()
        if sf <= MAX_SF["simhash_neardup"]:
            tel["simhash_candidates"] = dedup.simhash_neardup_pairs(
                docs, "text", "doc_id", bits=32, max_hamming=32
            ).count()
            tel["simhash_pairs_final"] = dedup.simhash_neardup_pairs(
                docs, "text", "doc_id", bits=32, max_hamming=3
            ).count()
            tel["simhash60_candidates"] = dedup.simhash_neardup_pairs(
                docs, "text", "doc_id", bits=60, max_hamming=60, chunks=4
            ).count()
        if sf <= MAX_SF["embed_neardup"]:
            tel["embed_pairs_final"] = similarity.cosine_pairs_blocked(
                emb, 0.45, "embedding", "vec_id"
            ).count()
        spark.catalog.clearCache()
        Path(out_path).write_text(json.dumps(report, indent=1))

    print(json.dumps({k: v for k, v in report["sfs"].items()}, indent=1)[:2000])


if __name__ == "__main__":
    main()
