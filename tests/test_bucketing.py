from __future__ import annotations

import io
import tempfile
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def test_bucketed_join_avoids_shuffle(spark):
    """SURVEY §4: pre-bucketing both sides of a recurring fact-fact join
    on the join key removes the per-query shuffle — the explain must
    show a SortMergeJoin with NO Exchange above either scan."""
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    # disable auto-broadcast: at test scale everything broadcasts, which
    # hides the bucketed path we're asserting (at 100 TB neither side fits)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    with tempfile.TemporaryDirectory() as d:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '{d}/wh'")
        try:
            (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
             .mode("overwrite").saveAsTable("bdemo.li_b"))
            (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
             .mode("overwrite").saveAsTable("bdemo.ord_b"))
            a = spark.table("bdemo.li_b")
            b = spark.table("bdemo.ord_b")
            joined = a.join(b, a.l_orderkey == b.o_orderkey).groupBy("o_orderpriority").count()
            buf = io.StringIO()
            with redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            # the join itself must not introduce a shuffle on either side:
            # the only allowed Exchange is the one for the final groupBy
            join_section = plan.split("HashAggregate")[0]
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            assert "Exchange" not in join_section
            # and results are right
            total = joined.agg(F.sum("count")).collect()[0][0]
            assert total == li.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS bdemo.li_b")
            spark.sql("DROP TABLE IF EXISTS bdemo.ord_b")
            spark.sql("DROP DATABASE IF EXISTS bdemo")
