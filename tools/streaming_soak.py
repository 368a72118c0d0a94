"""Streaming soak: drive the four stateful streaming operators with a
live rate source for a sustained window and record state-store size
(`lastProgress.stateOperators[].numRowsTotal`) over time.

The parity/smoke tests prove the operators CORRECT per micro-batch;
this measures the claim the 100 TB section makes about them — that
watermarks / timeouts / key cardinality BOUND the state, so a
long-running pipeline plateaus instead of accumulating. Bounded here
means: input rows keep growing linearly for the whole soak while
state rows flatten (max of the last third of samples within ~20% of
the middle third, after the initial ramp of one watermark horizon).

Ops and their expected bound:
- dedup_exact_stream          distinct fingerprints inside the horizon
- token_bucket_rate_limit     key cardinality (no timeout: state = keys)
- stream_stream_join          rows within (within + watermark) on both sides
- pool_context_stream         live (scope, context) pairs; event-time timeout

Usage: python tools/streaming_soak.py OUT.json [seconds_per_op]
Env:
  SPARK_GRAFT_STATE_STORE=rocksdb   use RocksDBStateStoreProvider (the
                                    100 TB story's state store) instead
                                    of the default HDFS-backed one
  SPARK_GRAFT_SOAK_OPS=pool,dedup   comma-filter of ops to run
                                    (dedup|bucket|join|pool; default all)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def rate(spark, rows_per_sec: int):
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_sec)
        .load()
    )


def soak(q, seconds: int, sample_every: float = 5.0) -> dict:
    t0 = time.time()
    samples = []
    while time.time() - t0 < seconds:
        time.sleep(sample_every)
        p = q.lastProgress
        if not p:
            continue
        ops = p.get("stateOperators") or []
        samples.append(
            {
                "t": round(time.time() - t0, 1),
                "state_rows": sum(o.get("numRowsTotal", 0) for o in ops),
                "input_rows_cum": sum(
                    s["numInputRows"] for s in [p] if "numInputRows" in s
                ),
                "batch": p.get("batchId"),
            }
        )
    q.stop()
    rows = [s["state_rows"] for s in samples]
    n = len(rows)
    mid = rows[n // 3 : 2 * n // 3] or [0]
    tail = rows[2 * n // 3 :] or [0]
    return {
        "samples": samples,
        "mid_third_max": max(mid),
        "last_third_max": max(tail),
        "bounded": max(tail) <= max(max(mid) * 1.2, max(mid) + 50),
    }


def main() -> None:
    out_path = sys.argv[1]
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 120

    from syslog_ng_spark.session import get_session

    import os

    spark = get_session("streaming-soak")
    spark.sparkContext.setLogLevel("ERROR")
    store = os.environ.get("SPARK_GRAFT_STATE_STORE", "")
    if store.lower() == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    ops = set(
        filter(None, os.environ.get("SPARK_GRAFT_SOAK_OPS", "dedup,bucket,join,pool").split(","))
    )
    # fresh checkpoints per run: a checkpoint is bound to the provider
    # that created it, so reusing the r5 paths under RocksDB would fail
    ckpt = f"/tmp/soak_ckpt_{int(time.time())}"
    report = {"state_store": store or "default"}

    if "dedup" in ops:
        _soak_dedup(spark, report, seconds, ckpt)
    if "bucket" in ops:
        _soak_bucket(spark, report, seconds, ckpt)
    if "join" in ops:
        _soak_join(spark, report, seconds, ckpt)
    if "pool" in ops:
        _soak_pool(spark, report, seconds, ckpt)

    Path(out_path).write_text(json.dumps(report, indent=1))
    summary = {
        k: {
            "bounded": v["bounded"],
            "mid_third_max": v["mid_third_max"],
            "last_third_max": v["last_third_max"],
        }
        for k, v in report.items()
        if isinstance(v, dict) and "bounded" in v
    }
    print(json.dumps(summary, indent=1))


def _soak_dedup(spark, report, seconds, ckpt):
    from pyspark.sql import functions as F

    from syslog_ng_spark.operators.dedup import dedup_exact_stream

    # 1. streaming ingest dedup: 500 rows/s, 2000 distinct texts,
    #    10 s horizon -> state bounded by distinct fps in horizon
    src = rate(spark, 500).select(
        F.col("timestamp").alias("ts"),
        F.concat(F.lit("doc text "), (F.col("value") % 2000).cast("string")).alias("text"),
    )
    q = (
        dedup_exact_stream(src, "text", "ts", watermark="10 seconds")
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt + "_dedup")
        .start()
    )
    report["dedup_exact_stream"] = soak(q, seconds)
    print("dedup_exact_stream", report["dedup_exact_stream"]["samples"][-1], flush=True)


def _soak_bucket(spark, report, seconds, ckpt):
    from pyspark.sql import functions as F

    from syslog_ng_spark.streaming.stateful import token_bucket_rate_limit

    # 2. token bucket: 100 keys, no timeout -> state = key cardinality
    src = rate(spark, 500).select(
        F.col("timestamp").alias("ts"), (F.col("value") % 100).alias("user_id")
    )
    q = (
        token_bucket_rate_limit(src, "user_id", "ts", rate_per_sec=2.0, burst=5)
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt + "_bucket")
        .start()
    )
    report["token_bucket_rate_limit"] = soak(q, seconds)
    print("token_bucket_rate_limit", report["token_bucket_rate_limit"]["samples"][-1], flush=True)


def _soak_join(spark, report, seconds, ckpt):
    from pyspark.sql import functions as F

    from syslog_ng_spark.streaming.joins import stream_stream_join

    # 3. stream-stream interval join: both sides watermarked 10 s,
    #    right must land within 5 s of left
    left = rate(spark, 200).select(
        F.col("timestamp").alias("ts"), (F.col("value") % 50).alias("corr_key"),
        F.lit("left payload").alias("l_msg"),
    )
    right = rate(spark, 200).select(
        F.col("timestamp").alias("ts"), (F.col("value") % 50).alias("corr_key"),
        F.lit("right payload").alias("r_msg"),
    )
    q = (
        stream_stream_join(
            left, right, "corr_key", within="5 seconds", watermark="10 seconds"
        )
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt + "_join")
        .start()
    )
    report["stream_stream_join"] = soak(q, seconds)
    print("stream_stream_join", report["stream_stream_join"]["samples"][-1], flush=True)


def _soak_pool(spark, report, seconds, ckpt):
    from pyspark.sql import functions as F

    from syslog_ng_spark.streaming.stateful import pool_context_stream

    # 4. patterndb pool contexts: 300 rotating contexts, 5 s timeout,
    #    event-time expiry -> live contexts plateau
    src = rate(spark, 500).select(
        F.col("timestamp").alias("ts"),
        F.concat(F.lit("host-"), (F.col("value") % 20).cast("string")).alias("_scope_key"),
        (F.col("value") % 300).cast("string").alias("CONTEXT_ID"),
        F.lit(5).cast("long").alias("_timeout"),
        F.lit('{"k":"v"}').alias("sdata_json"),
    )
    q = (
        pool_context_stream(src, ts="ts", merge_json_col="sdata_json", watermark="10 seconds")
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt + "_pool")
        .start()
    )
    report["pool_context_stream"] = soak(q, seconds)
    print("pool_context_stream", report["pool_context_stream"]["samples"][-1], flush=True)


if __name__ == "__main__":
    main()
