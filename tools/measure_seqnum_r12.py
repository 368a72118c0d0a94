"""r12 measurement (VERDICT item #5): the delivery-order $SEQNUM
counting pass. BEFORE (r11): a second full recompute of the frame with
a first(struct(<every column>)) probe so AQE coalesced the counting
and numbering passes identically — i.e. ~2× full-width reads. AFTER
(r12): persist(MEMORY_AND_DISK) pins the layout; the count pass reads
the cache and the probe is gone. Run on a WIDE frame (all 16 lineitem
columns, scaled ~16x by self-union -> ~9.6M rows) where the
full-width probe hurts most. Prints one JSON line for SCALE.md."""
import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .config("spark.sql.shuffle.partitions", CPUS)
    .config("spark.driver.memory", "16g")
    .appName("seqnum-r12-measure")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def wide_frame(expensive=False):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = li
    for _ in range(4):
        out = out.unionAll(out)
    if expensive:
        # a realistic parse-shaped upstream: regex work per row, so
        # recomputing the frame for the count pass costs real CPU
        txt = F.concat_ws(" ", *[F.col(c).cast("string") for c in li.columns])
        out = out.withColumn(
            "_parsed", F.regexp_extract(txt, r"([0-9]+)[.]([0-9]+)", 1),
        ).withColumn(
            "_toks", F.size(F.split(txt, r"[ .\-]+"))
        ).filter(F.col("_toks") >= 0)
    # a shuffle tail so AQE coalescing is in play, like r11's bug setup
    return out.repartition(64, "l_orderkey")


def old_numbered(df, target, start=1):
    """The r11 shape: probe struct forces identical AQE coalescing;
    the count pass recomputes the full frame."""
    aggs = [F.count(F.lit(1)).alias("count"),
            F.first(F.struct(*[F.col(c) for c in df.columns])).alias("_probe")]
    counts = (df.groupBy(F.spark_partition_id().alias("pid")).agg(*aggs)
              .select("pid", "count").collect())
    by_pid = {r["pid"]: r["count"] for r in counts}
    offsets, acc = [], start
    for pid in range(max(by_pid) + 1):
        offsets.append(acc)
        acc += by_pid.get(pid, 0)
    mid = F.monotonically_increasing_id()
    pid = F.shiftright(mid, 33).cast("int")
    row = mid.bitwiseAND(F.lit((1 << 33) - 1))
    arr = F.array(*[F.lit(o) for o in offsets])
    return df.withColumn(target, (F.element_at(arr, pid + 1) + row).cast("long"))


def consume(df):
    # destination-writer-shaped consumption: render + count distinct check
    r = df.select("seqnum", "l_orderkey").agg(
        F.count("*").alias("n"), F.countDistinct("seqnum").alias("d")).head()
    assert r["n"] == r["d"], (r["n"], r["d"])
    return r["n"]


results = {}
for scenario, expensive in (("cheap_upstream", False), ("parse_upstream", True)):
    res = {}
    for name in ("old_probe", "new_persist"):
        best = None
        for _ in range(3):
            df = wide_frame(expensive)
            t0 = time.time()
            if name == "old_probe":
                out = old_numbered(df, "seqnum")
                n = consume(out)
            else:
                from syslog_ng_spark.operators.delivery import (
                    numbered_in_order, release_numbering_cache)
                out = numbered_in_order(df, "seqnum")
                n = consume(out)
                release_numbering_cache(out)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        res[name] = {"sec": round(best, 2), "rows": int(n)}
    res["speedup"] = round(res["old_probe"]["sec"] / res["new_persist"]["sec"], 2)
    results[scenario] = res

results["loadavg"] = os.getloadavg()[0]
print(json.dumps({"measure": "seqnum_count_pass_r12", "sf_dir": SF_DIR, **results}))
spark.stop()
