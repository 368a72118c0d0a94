"""Round-6 operator scale measurements (VERDICT tasks 3-6).

1. semantic_decontaminate: the r5 measurement showed 3.0x in its last
   decade. Hypothesis (VERDICT task 5): the hyperplane count is FIXED
   (3 planes -> 8 buckets), so bucket occupancy grows with the corpus
   and the bucket equi-join's candidate volume Sum_b(c_b*e_b) turns
   quadratic — the same fixed-bucket-space failure the simhash32 and
   minhash measurements already pinned (SCALE.md §4). Telemetry
   records candidates + hottest bucket for fixed-3 vs log-scaled
   planes at each SF; wall time for both variants.
2. hard_negatives: neg_lo percentile calibration (task 3) — window
   input rows + wall with neg_lo=0 vs neg_lo_quantile=0.9 (approx
   calibration, the 100 TB path); positives must be identical.
3. quality quantile selection (task 4): exact percentile vs
   approx_percentile at scale — wall + threshold drift.
4. dsir_logweight (task 6): wall time of the r6 one-md5-per-token
   feature pass (vs the r5 floor recorded in SCALE.md Addendum 7).

Usage: python tools/r6_ops_experiment.py OUT.json SF_DIR [SF_DIR ...]
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from syslog_ng_spark.session import get_session  # noqa: E402
from syslog_ng_spark.operators import similarity, textstats  # noqa: E402
from syslog_ng_spark.operators.sampling import quantile_select  # noqa: E402
from syslog_ng_spark.ann_fixtures import IVF_CENTROIDS  # noqa: E402


def planes_for(n: int) -> list[list[float]]:
    return [[(((i * 7 + j * 3) % 11) - 5.0) for j in range(64)] for i in range(1, n + 1)]


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
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {}

    for sf_dir in sf_dirs:
        name = Path(sf_dir).name
        row: dict = {}
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_emb = emb.count()
        row["n_emb"] = n_emb

        # --- 1. semantic_decontaminate: fixed vs scaled planes -------
        evalset = emb.where(F.col("vec_id") % 20 == 0)
        corpus = emb.where(F.col("vec_id") % 20 != 0)
        # scale planes so 2^p ~ n/1500 (bucket occupancy ~constant)
        p_scaled = max(3, int(math.log2(max(n_emb, 2) / 1500)) + 1)
        for label, n_planes in (("fixed3", 3), (f"scaled{p_scaled}", p_scaled)):
            pl = planes_for(n_planes)
            cb = (
                similarity.lsh_buckets(corpus, pl, "embedding", "_b")
                .groupBy("_b").agg(F.count(F.lit(1)).alias("c"))
            )
            ebk = (
                similarity.lsh_buckets(evalset, pl, "embedding", "_b")
                .groupBy("_b").agg(F.count(F.lit(1)).alias("e"))
            )
            tel = cb.join(ebk, "_b").agg(
                F.sum(F.col("c") * F.col("e")).alias("cand"),
                F.max(F.col("c") * F.col("e")).alias("hottest"),
                F.count(F.lit(1)).alias("buckets_hit"),
            ).first()
            row[f"decon_{label}_candidates"] = int(tel["cand"] or 0)
            row[f"decon_{label}_hottest_bucket"] = int(tel["hottest"] or 0)
            row[f"decon_{label}_buckets"] = int(tel["buckets_hit"] or 0)
            row[f"decon_{label}_s"] = timed(
                lambda pl=pl: similarity.semantic_decontaminate(
                    corpus, evalset, pl, threshold=0.25
                ).count()
            )
            # recall proxy: flagged docs must not shrink when planes
            # widen beyond hash-boundary noise — record the count
            row[f"decon_{label}_flagged"] = similarity.semantic_decontaminate(
                corpus, evalset, pl, threshold=0.25
            ).count()

        # --- 2. hard_negatives: neg_lo calibration --------------------
        def hn(**kw):
            return similarity.hard_negatives(
                emb, IVF_CENTROIDS, pos_threshold=0.25, neg_lo=0.0,
                assign_kernel="pandas", **kw
            )

        row["hn_uncal_s"] = timed(lambda: hn().count())
        row["hn_cal_s"] = timed(
            lambda: hn(neg_lo_quantile=0.9, calib_method="approx").count()
        )
        # window input rows = banded candidates surviving the _cat cut;
        # measure via the same agg the operator's plan runs
        a = similarity.ivf_assign_pandas(emb, IVF_CENTROIDS, "embedding", "vec_id", "_cell")
        cell_sizes = a.groupBy("_cell").agg(F.count(F.lit(1)).alias("k"))
        row["hn_pair_instances"] = int(
            cell_sizes.agg(F.sum(F.expr("k * (k - 1)"))).first()[0] or 0
        )
        base = hn().select("anchor_id", "pos_id", "pos_cos")
        cal = hn(neg_lo_quantile=0.9, calib_method="approx").select(
            "anchor_id", "pos_id", "pos_cos"
        )
        row["hn_positives_changed"] = base.exceptAll(cal).count() + cal.exceptAll(base).count()

        # --- 3. quantile select: exact vs approx ----------------------
        scored = docs.select(
            "doc_id", "lang", textstats.quality_score(F.col("text")).alias("q")
        )
        row["quantile_exact_s"] = timed(
            lambda: quantile_select(scored, "q", "lang", q=0.6).count()
        )
        row["quantile_approx_s"] = timed(
            lambda: quantile_select(scored, "q", "lang", q=0.6, method="approx").count()
        )
        n_exact = quantile_select(scored, "q", "lang", q=0.6).count()
        n_approx = quantile_select(scored, "q", "lang", q=0.6, method="approx").count()
        row["quantile_select_drift_rows"] = abs(n_exact - n_approx)
        row["quantile_selected_rows"] = n_exact

        # --- 4. dsir r6 feature pass ----------------------------------
        tgt = docs.where(F.col("source") == "src0")
        row["dsir_r6_s"] = timed(
            lambda: textstats.dsir_logweight(docs, tgt, "text", "doc_id", dim=1024)
            .count()
        )

        results[name] = row
        spark.catalog.clearCache()
        print(name, json.dumps(row), flush=True)

    Path(out_path).write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
