"""r14: steady-state per-phase timing of the ANN training replay —
5 in-process reps of each phase (mimics bench min-of-3), printing each
rep so warmup vs steady state is visible.
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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("r14-ann-profile2")
    spark.sparkContext.setLogLevel("ERROR")
    emb = rebalance(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))
    corpus = emb.where(F.col("vec_id") != 0)
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    ]

    def phase(label, fn, reps=5):
        times = []
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            out = fn()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{label:36s} {times} min={min(times)}")
        return out

    cents = phase("ivf_train", lambda: similarity.ivf_train(corpus, k=16, iters=2))
    books = phase("pq_train", lambda: similarity.pq_train(corpus, m=4, k=8, iters=2))
    phase("ivfpq scan+noop", lambda: similarity.ivfpq_topk(
        corpus, qvec, cents, books, k=10, nprobe=4
    ).write.format("noop").mode("overwrite").save())
    phase("full ann_ivfpq_topk", lambda: (
        lambda c, b: similarity.ivfpq_topk(corpus, qvec, c, b, k=10, nprobe=4)
        .write.format("noop").mode("overwrite").save()
    )(similarity.ivf_train(corpus, k=16, iters=2), similarity.pq_train(corpus, m=4, k=8, iters=2)), reps=3)


if __name__ == "__main__":
    main()
