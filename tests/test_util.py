from __future__ import annotations

from pyspark.sql import functions as F

from syslog_ng_spark.util import rebalance, salted_join


def test_salted_join_matches_plain_join(spark):
    # heavy skew: 90% of left rows share one key
    left = spark.createDataFrame(
        [(1 if i < 900 else i % 50, i) for i in range(1000)], "k int, v int"
    )
    right = spark.createDataFrame([(i, f"r{i}") for i in range(50)], "k int, name string")
    plain = left.join(right, "k").select("k", "v", "name")
    salted = salted_join(left, right, "k", salt=8).select("k", "v", "name")
    assert plain.count() == salted.count() == 1000
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], "k int, v string")
    right = spark.createDataFrame([(1, "x")], "k int, name string")
    rows = {(r.k, r.name) for r in salted_join(left, right, "k", salt=4, how="left").collect()}
    assert rows == {(1, "x"), (99, None)}


def test_rebalance_spreads_partitions(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "v int").coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = rebalance(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 100


def test_rebalance_blocks_predicate_pushdown(spark):
    """r14: a filter applied above rebalance() must NOT be pushed
    below the repartition Exchange — on an under-partitioned input
    the pre-shuffle stage is serial, and pushing an expensive regex
    predicate there re-serializes the exact work rebalance exists to
    parallelize. Rows are unchanged (the barrier predicate is
    trivially true)."""
    df = spark.createDataFrame([(i, f"m{i}") for i in range(100)], "v int, s string").coalesce(1)
    out = rebalance(df).where(F.col("s").rlike("m[0-9]+"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the plan prints top-down, so text after the Exchange line is the
    # pre-shuffle side: the RLIKE predicate must not appear there
    ex_pos = plan.index("Exchange")
    assert "RLIKE" not in plan[ex_pos:], "predicate was pushed below the exchange"
    assert out.count() == 100


def test_track_release_cached(spark):
    """Operators that persist intermediates attach them to the lazy
    result; release_cached frees every one (the ADVICE leak: repeated
    invocations in a long-lived session accumulated MEMORY_AND_DISK
    entries the caller could not release)."""
    from syslog_ng_spark.operators.dedup import repeated_passages
    from syslog_ng_spark.util import release_cached

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l"), (2, "a b c d e f g h i j z z")],
        "doc_id long, text string",
    )
    out = repeated_passages(df, n=10, min_docs=2)
    cached = getattr(out, "_cached_intermediates", [])
    assert cached, "repeated_passages must expose its persisted frame"
    out.collect()
    assert all(c.storageLevel.useMemory or c.storageLevel.useDisk for c in cached)
    release_cached(out)
    assert all(
        not (c.storageLevel.useMemory or c.storageLevel.useDisk) for c in cached
    )
    assert out._cached_intermediates == []
    release_cached(out)  # idempotent
