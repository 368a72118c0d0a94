"""r14: bench.py's exact min-of-N methodology over a named subset of
catalog queries (for tight before/after A/B without the full 195-query
run). Usage: python tools/r14_bench_subset.py q1 q2 ...
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from syslog_ng_spark.catalog import QUERIES  # noqa: E402
from syslog_ng_spark.session import get_session  # noqa: E402

N_RUNS = 3


def main():
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_session("r14-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    timings = {}
    for name in names:
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        timings[name] = min(runs)
        print(f"{name:32s} min={min(runs):7.3f} runs={runs}", flush=True)
    print(json.dumps({"total": round(sum(timings.values()), 3), "queries": timings}))


if __name__ == "__main__":
    main()
