"""r14: dump `.explain("formatted")` for named catalog queries to
files — the judge-facing plan evidence (plans/r14/<query>_{before,after}.txt).

Usage: python tools/r14_plans.py OUTDIR SUFFIX query [query ...]
Writes OUTDIR/<query>_<SUFFIX>.txt for each query. Run from a worktree
at the r13 HEAD for the _before set, from the working tree for _after.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from syslog_ng_spark.catalog import QUERIES  # noqa: E402
from syslog_ng_spark.session import get_session  # noqa: E402


def main():
    outdir, suffix = Path(sys.argv[1]), sys.argv[2]
    names = sys.argv[3:]
    outdir.mkdir(parents=True, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("r14-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        (outdir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)", flush=True)


if __name__ == "__main__":
    main()
