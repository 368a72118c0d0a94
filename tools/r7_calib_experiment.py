"""Round-7 targeted measurements for SCALE.md Addendum 11 §2-3.

1. hard_negatives calibrated-floor cost AFTER the r7 persist fix
   (sf1): the r6 implementation recomputed the IVF-cell join for the
   floor agg (measured 130.3s calibrated vs 75.5s uncalibrated); with
   the narrow cand persisted the calibrated run should cost roughly
   one join + one tiny agg. Also records the WINDOW INPUT reduction
   (banded candidate rows entering the (anchor,category) window) —
   the lever the floor exists for.
2. quantile_select exact vs approx at sf10 (the r6_ops run was cut
   before its sf10 row; these are seconds, not minutes).
3. dsir_logweight at sf10 (same cut).

Usage: python tools/r7_calib_experiment.py OUT.json SF1_DIR SF10_DIR
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from syslog_ng_spark.session import get_session  # noqa: E402
from syslog_ng_spark.operators import similarity, textstats  # noqa: E402
from syslog_ng_spark.operators.sampling import quantile_select  # noqa: E402
from syslog_ng_spark.ann_fixtures import IVF_CENTROIDS  # noqa: E402
from syslog_ng_spark.util import release_cached  # noqa: E402


def timed(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 2)


def main() -> None:
    out_path, sf1_dir, sf10_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    results: dict = {}

    def save(k, v):
        results[k] = v
        Path(out_path).write_text(json.dumps(results, indent=2))
        print(f"{k}={v}", flush=True)

    # --- 1. hn calibration, post-fix (sf1, same config as r6_ops) ----
    emb = spark.read.parquet(f"{sf1_dir}/embeddings.parquet")

    def hn(**kw):
        return similarity.hard_negatives(
            emb, IVF_CENTROIDS, pos_threshold=0.25, neg_lo=0.0,
            assign_kernel="pandas", **kw
        )

    def run_hn(**kw):
        df = hn(**kw)
        df.write.format("noop").mode("overwrite").save()
        release_cached(df)

    save("sf1_hn_uncal_s", timed(lambda: run_hn()))
    save("sf1_hn_cal_s", timed(
        lambda: run_hn(neg_lo_quantile=0.9, calib_method="approx")))

    # window-input reduction: banded rows surviving the _cat cut
    a = similarity.ivf_assign_pandas(emb, IVF_CENTROIDS, "embedding", "vec_id", "_cell")
    b = a.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("_vb"), "_cell")
    aa = a.select(F.col("vec_id").alias("anchor_id"), F.col("embedding").alias("_va"), "_cell")
    from syslog_ng_spark.operators.similarity import dot, norm
    cand = (
        aa.join(b, "_cell").where(F.col("anchor_id") != F.col("cand_id"))
        .select(F.round(
            dot(F.col("_va"), F.col("_vb"))
            / (norm(F.col("_va")) * norm(F.col("_vb"))), 6).alias("cos_sim"))
    ).persist()
    n_all = cand.where(F.col("cos_sim") >= 0.0).count()
    floor = cand.where(F.col("cos_sim") < 0.25).selectExpr(
        "round(approx_percentile(cos_sim, 0.9, 10000), 6) AS f").first()["f"]
    n_cal = cand.where(
        (F.col("cos_sim") >= F.lit(float(floor))) | (F.col("cos_sim") >= 0.25)
    ).count()
    cand.unpersist()
    save("sf1_hn_window_rows_uncal", n_all)
    save("sf1_hn_window_rows_cal", n_cal)
    save("sf1_hn_floor", float(floor))

    # --- 2. quantile select at sf10 -----------------------------------
    docs = spark.read.parquet(f"{sf10_dir}/documents.parquet")
    scored = docs.select(
        "doc_id", "lang", textstats.quality_score(F.col("text")).alias("q"))
    save("sf10_quantile_exact_s", timed(
        lambda: quantile_select(scored, "q", "lang", q=0.6).count()))
    save("sf10_quantile_approx_s", timed(
        lambda: quantile_select(scored, "q", "lang", q=0.6, method="approx").count()))
    n_exact = quantile_select(scored, "q", "lang", q=0.6).count()
    n_approx = quantile_select(scored, "q", "lang", q=0.6, method="approx").count()
    save("sf10_quantile_drift_rows", abs(n_exact - n_approx))
    save("sf10_quantile_selected_rows", n_exact)

    # --- 3. dsir at sf10 ----------------------------------------------
    tgt = docs.where(F.col("source") == "src0")
    def run_dsir():
        df = textstats.dsir_logweight(docs, tgt, "text", "doc_id", dim=1024)
        df.write.format("noop").mode("overwrite").save()
        release_cached(df)
        spark.catalog.clearCache()
    save("sf10_dsir_r6_s", timed(run_dsir))


if __name__ == "__main__":
    main()
