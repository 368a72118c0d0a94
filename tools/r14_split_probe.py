"""r14: split a catalog query's wall time into driver plan-build
(QUERIES[name] call), analysis/optimization (explain trigger), and
execution (noop write) — guide §1's "time the computation" applied to
the driver side. Usage: python tools/r14_split_probe.py q [q ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from syslog_ng_spark.catalog import QUERIES  # noqa: E402
from syslog_ng_spark.session import get_session  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("r14-split-probe")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in sys.argv[1:]:
        for rnd in range(2):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            spark.catalog.clearCache()
            print(
                f"{name:28s} r{rnd} build={t1 - t0:6.3f} plan={t2 - t1:6.3f} "
                f"exec={t3 - t2:6.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
