"""Round-11 scale laws for the round's new operators (SCALE.md
Addendum 18): the reference-exact kv-scanner, per-delivery $SEQNUM
numbering, and context-evaluating trigger templates.

Measured at sf0.1 / sf1 / sf10 (events 100k → 1M → 10M rows),
local[32], min-of-2 noop writes:

1. kv_scanner_parser over synthesized kv lines (quoted value + stray
   words per row) — msgs/s; ONE regexp_extract_all pass per row, so
   the law should be ~linear per decade once splits exist.
2. assign_seqnum physical-order numbering vs the bare scan — the
   overhead of the two-pass partition-offset pattern (one counting
   job + the numbered write), and the order_by variant's
   repartitionByRange cost.
3. the patterndb_grep_context gate (sessionize + collect_list +
   per-context template eval) — wall per decade; the collect_list
   rides the ONE pool shuffle.

Usage: python tools/r11_ops_experiment.py OUT.json SF_DIR [SF_DIR...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from syslog_ng_spark.catalog import QUERIES, T  # noqa: E402
from syslog_ng_spark.operators.delivery import assign_seqnum  # noqa: E402
from syslog_ng_spark.operators.kvscan import kv_scanner_parser  # noqa: E402
from syslog_ng_spark.session import get_session  # noqa: E402


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
    results = []
    for sf_dir in sf_dirs:
        ev = T(spark, sf_dir, "events")
        n = ev.count()
        wide = ev.repartition(32)

        # 1. kv scanner: one quoted value, strays, a pair-sep stop
        line = F.concat(
            F.lit("hdr"), F.col("event_id").cast("string"),
            F.lit(" user=u"), F.col("user_id").cast("string"),
            F.lit(' msg="hello '), (F.col("event_id") % 7).cast("string"),
            F.lit(' x=1" count='), (F.col("event_id") % 100).cast("string"),
            F.lit(", tail"),
        )
        kv_in = wide.select("event_id", line.alias("line"))
        t_kv = timed(
            lambda: kv_scanner_parser(kv_in, "line", stray_words_target="s")
            .write.format("noop").mode("overwrite").save()
        )

        # 2. seqnum numbering overhead
        t_scan = timed(
            lambda: wide.write.format("noop").mode("overwrite").save()
        )
        t_seq = timed(
            lambda: assign_seqnum(wide)
            .write.format("noop").mode("overwrite").save()
        )
        t_seq_ord = timed(
            lambda: assign_seqnum(wide, order_by="event_id")
            .write.format("noop").mode("overwrite").save()
        )

        # 3. context-evaluating trigger templates (the r11 gate)
        t_grep = timed(
            lambda: QUERIES["patterndb_grep_context"](spark, sf_dir)
            .write.format("noop").mode("overwrite").save()
        )

        entry = {
            "dir": sf_dir,
            "events": n,
            "kv_scanner_sec": t_kv,
            "kv_scanner_msgs_per_sec": round(n / t_kv) if t_kv else None,
            "bare_scan_sec": t_scan,
            "seqnum_sec": t_seq,
            "seqnum_order_by_sec": t_seq_ord,
            "grep_context_sec": t_grep,
        }
        results.append(entry)
        print(json.dumps(entry))
    Path(out_path).write_text(json.dumps(results, indent=1) + "\n")


if __name__ == "__main__":
    main()
