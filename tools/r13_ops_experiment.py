"""r13 operator scaling measurements.

1. Context chaining with live-context seed templates (batch
   patterndb_actions): wall time at N and 10N input rows, plain seeds
   vs $(grep)/$(context-length)/@N seeds — the ctxref path adds
   per-row helper columns (wider pool) plus context-row collection;
   this measures what that width costs and whether the generation
   loop stays linear.
2. Source options (_apply_source_options): events_as_logs scan with
   and without tags/overrides — expected ~zero, it is three
   withColumns with no shuffle.

Writes SCALE_r13_ops.json. Run on a quiet host, nothing else on the
JVM.
"""

from __future__ import annotations

import datetime as dt
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from syslog_ng_spark.session import get_session  # noqa: E402

T0 = dt.datetime(2024, 1, 1)

PLAIN_XML = """<patterndb version='5' pub_date='2010-02-22'>
 <ruleset name='chainset' id='2'>
  <rules>
    <rule provider='test' id='20' class='violation' context-scope='program'
          context-id='login-${PID}' context-timeout='10'>
     <patterns><pattern>user login</pattern></patterns>
     <actions>
       <action trigger='timeout' condition='"${MESSAGE}" eq "user login beta"'>
         <create-context context-id='watch-${PID}' context-timeout='100'
                         context-scope='program'>
           <message inherit-properties='last-message'>
             <values><value name='MESSAGE'>watching ${PID}</value></values>
           </message>
         </create-context>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='21' class='violation' context-scope='program'
          context-id='watch-${PID}' context-timeout='100'>
     <patterns><pattern>suspicious activity</pattern></patterns>
     <actions>
       <action trigger='timeout'>
         <message inherit-properties='last-message'>
           <values><value name='MESSAGE'>alert last=${MESSAGE}</value></values>
         </message>
       </action>
     </actions>
    </rule>
  </rules>
 </ruleset>
</patterndb>"""

CTXREF_XML = PLAIN_XML.replace(
    "watching ${PID}",
    "watch n=$(context-length) top=$(grep ('${MESSAGE}' ne 'user login skip')"
    " ${MESSAGE}) prev=${MESSAGE}@1",
).replace(
    "alert last=${MESSAGE}",
    "alert len=$(context-length) seed=${MESSAGE}@1",
)


def chain_logs(spark, n_users: int):
    """Per user: 3 logins (last 'beta') + 1 joiner — every login
    context chains, every watch context alerts."""
    base = spark.range(n_users).select(F.col("id").alias("uid"))
    parts = []
    for j, msg in enumerate(
            ["user login fill", "user login skip", "user login beta"]):
        parts.append(base.select(
            (F.col("uid") * 10 + j).alias("event_id"),
            (F.lit(T0) + F.make_dt_interval(secs=F.lit(j))).alias("ts"),
            F.lit("h1").alias("host"), F.lit("p1").alias("program"),
            F.col("uid").cast("int").alias("pid"), F.lit(msg).alias("message"),
        ))
    parts.append(base.select(
        (F.col("uid") * 10 + 5).alias("event_id"),
        (F.lit(T0) + F.make_dt_interval(secs=F.lit(40))).alias("ts"),
        F.lit("h1").alias("host"), F.lit("p1").alias("program"),
        F.col("uid").cast("int").alias("pid"),
        F.lit("suspicious activity").alias("message"),
    ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn, n=3):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 3))
    return runs


def main():
    from syslog_ng_spark.config import _apply_source_options
    from syslog_ng_spark.datamodel import events_as_logs
    from syslog_ng_spark.operators.actions import (
        load_patterndb_rules, patterndb_actions)

    spark = get_session("r13-ops")
    spark.sparkContext.setLogLevel("ERROR")
    res = {}

    for label, xml in (("plain", PLAIN_XML), ("ctxref", CTXREF_XML)):
        rules = load_patterndb_rules(xml)
        for n_users in (12_500, 125_000):  # 50k / 500k rows
            logs = chain_logs(spark, n_users)
            logs.write.format("noop").mode("overwrite").save()  # warm

            def run():
                patterndb_actions(
                    logs, rules, order_tiebreak="event_id"
                ).write.format("noop").mode("overwrite").save()
                spark.catalog.clearCache()

            runs = timed(run)
            res[f"chain_{label}_{n_users * 4}_rows"] = {
                "runs": runs, "min": min(runs)}
            print(label, n_users * 4, runs, flush=True)

    sf_dir = "/root/testdata/sf0.1"
    from syslog_ng_spark.catalog import T
    ev = T(spark, sf_dir, "events")
    logs = events_as_logs(ev)

    def bare():
        logs.write.format("noop").mode("overwrite").save()

    def opted():
        _apply_source_options(logs, {
            "tags": ["ingest", "edge"], "host_override": "lb",
            "program_override": "collector",
        }).write.format("noop").mode("overwrite").save()

    res["source_options_off"] = {"runs": timed(bare)}
    res["source_options_on"] = {"runs": timed(opted)}
    res["note"] = (
        "chain_* : batch context chaining, 4 rows/user, every user chains "
        "once and alerts once; ctxref = $(context-length)/$(grep)/@N seed "
        "templates (per-row helper columns + context-row collect). "
        "source_options_*: _apply_source_options is withColumn-only, no "
        "shuffle."
    )
    Path("SCALE_r13_ops.json").write_text(json.dumps(res, indent=1))
    print(json.dumps(res)[:400])


if __name__ == "__main__":
    main()
