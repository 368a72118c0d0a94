"""r14 optimization round: stage-level profile of the ANN training
replay (ann_ivfpq_topk = ivf_train + pq_train + ivfpq scan).

Usage: python tools/r14_ann_profile.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from syslog_ng_spark.operators import similarity  # noqa: E402
from syslog_ng_spark.session import get_session  # noqa: E402
from syslog_ng_spark.util import rebalance  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:40s} {dt:7.3f}s")
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("r14-ann-profile")
    spark.sparkContext.setLogLevel("ERROR")

    def load():
        emb = rebalance(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
        corpus = emb.where(F.col("vec_id") != 0)
        qvec = [
            float(x)
            for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
        ]
        return emb, corpus, qvec

    emb, corpus, qvec = t("load + qvec first()", load)
    print("rows:", corpus.count(), "dim:", len(qvec))

    for rep in range(2):
        print(f"--- rep {rep} ---")
        spark.catalog.clearCache()
        cents = t("ivf_train(k=16, iters=2)", lambda: similarity.ivf_train(corpus, k=16, iters=2))
        books = t("pq_train(m=4, k=8, iters=2)", lambda: similarity.pq_train(corpus, m=4, k=8, iters=2))
        t("ivfpq_topk scan+noop", lambda: similarity.ivfpq_topk(
            corpus, qvec, cents, books, k=10, nprobe=4
        ).write.format("noop").mode("overwrite").save())
        t("ivf_topk scan+noop", lambda: similarity.ivf_topk(
            corpus, qvec, cents, k=10, nprobe=4
        ).write.format("noop").mode("overwrite").save())
        t("pq_topk scan+noop", lambda: similarity.pq_topk(
            corpus, qvec, books, k=10
        ).write.format("noop").mode("overwrite").save())
        t("semantic_dedup_pairs+noop", lambda: similarity.semantic_dedup_pairs(
            emb, cents, threshold=0.45
        ).write.format("noop").mode("overwrite").save())

    # finer ivf_train breakdown
    print("--- ivf_train internals ---")
    spark.catalog.clearCache()
    seed_hash = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    seeds = t("seeds collect", lambda: (
        corpus.select("vec_id", "embedding")
        .withColumn("_h", seed_hash)
        .orderBy("_h", "vec_id")
        .limit(16)
        .collect()
    ))
    centroids = [list(map(float, r[1])) for r in seeds]
    dim = len(centroids[0])
    for it in range(2):
        assigned = similarity.ivf_assign(corpus, centroids, "embedding", "_cell")
        sums = assigned.groupBy("_cell").agg(
            *[F.sum(F.element_at(F.col("embedding"), d + 1)).alias(f"s{d}") for d in range(dim)],
            F.count(F.lit(1)).alias("n"),
        )
        rows = t(f"lloyd round {it}: agg+collect", lambda: {r["_cell"]: r for r in sums.collect()})
        centroids = [
            [round(rows[i][f"s{d}"] / rows[i]["n"], 9) for d in range(dim)]
            if i in rows
            else centroids[i]
            for i in range(16)
        ]


if __name__ == "__main__":
    main()
