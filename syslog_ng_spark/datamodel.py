"""Canonical log-record data model.

The reference engine's unit of work is a ``LogMessage``
(reference: lib/logmsg/logmsg.h:130 — timestamps, PRI, HOST, PROGRAM,
PID, MESSAGE, dynamic name-value pairs, tags). We model the same record
as a DataFrame row with a fixed schema; dynamic NV-pairs become a
``map<string,string>`` column and tags an ``array<string>``.

Severity / facility follow RFC5424 numerical codes
(reference: lib/syslog-names.c:29 sl_levels / sl_facilities).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SEVERITY_NAMES = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]

FACILITY_NAMES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]

LOG_SCHEMA = StructType(
    [
        StructField("ts", TimestampType()),
        StructField("host", StringType()),
        StructField("program", StringType()),
        StructField("pid", IntegerType()),
        StructField("facility", IntegerType()),
        StructField("severity", IntegerType()),
        StructField("message", StringType()),
        StructField("sdata", MapType(StringType(), StringType())),
        StructField("tags", ArrayType(StringType())),
    ]
)

# Deterministic mapping of the synthetic `events` table onto the log
# model (documented; the DuckDB oracles use the same arithmetic).
#   severity: error->3(err) purchase->4(warning) signup->5(notice)
#             click->6(info) view->7(debug)
#   facility: error->3(daemon), everything else->16(local0)
EVENT_SEVERITY = {"error": 3, "purchase": 4, "signup": 5, "click": 6, "view": 7}

EVENT_SEVERITY_SQL = (
    "CASE event_type WHEN 'error' THEN 3 WHEN 'purchase' THEN 4 "
    "WHEN 'signup' THEN 5 WHEN 'click' THEN 6 ELSE 7 END"
)
EVENT_FACILITY_SQL = "CASE event_type WHEN 'error' THEN 3 ELSE 16 END"


def event_severity(event_type: Column) -> Column:
    expr = F.lit(7)
    for k, v in reversed(EVENT_SEVERITY.items()):
        expr = F.when(event_type == k, F.lit(v)).otherwise(expr)
    return expr.cast("int")


def event_facility(event_type: Column) -> Column:
    return F.when(event_type == "error", F.lit(3)).otherwise(F.lit(16)).cast("int")


def severity_name(severity: Column) -> Column:
    """$SEVERITY macro (reference: lib/template/macros.c M_SEVERITY)."""
    return F.element_at(F.array(*[F.lit(s) for s in SEVERITY_NAMES]), severity + 1)


def facility_name(facility: Column) -> Column:
    """$FACILITY macro (reference: lib/template/macros.c M_FACILITY)."""
    return F.element_at(F.array(*[F.lit(s) for s in FACILITY_NAMES]), facility + 1)


def pri(facility: Column, severity: Column) -> Column:
    """$PRI = facility*8 + severity (reference: lib/logmsg/logmsg.h LOG_PRI)."""
    return (facility * 8 + severity).cast("int")


# Plan memo keyed by input-DataFrame identity (r14): the projection
# below costs ~0.27 s of py4j round trips per build, and with
# catalog.T()/rebalance() memoized the same input plan object arrives
# on every query build. Stores a logical plan only — no data.
_LOGS_MEMO: dict[int, tuple] = {}


def events_as_logs(events: DataFrame) -> DataFrame:
    """Adapt the synthetic `events` table to the canonical log schema.

    host   = 'host-<user_id%20>'
    program= 'svc-<user_id%5>'
    message= '<event_type> value=<value printf %.3f> user=<user_id>'
    """
    hit = _LOGS_MEMO.get(id(events))
    if hit is not None and hit[0] is events:
        return hit[1]
    et = F.col("event_type")
    out = events.select(
        F.col("event_id"),
        F.col("user_id"),
        F.col("value"),
        F.col("ts"),
        F.concat(F.lit("host-"), (F.col("user_id") % 20).cast("string")).alias("host"),
        F.concat(F.lit("svc-"), (F.col("user_id") % 5).cast("string")).alias("program"),
        (F.col("event_id") % 32768).cast("int").alias("pid"),
        event_facility(et).alias("facility"),
        event_severity(et).alias("severity"),
        F.format_string("%s value=%.3f user=%d", et, F.col("value"), F.col("user_id")).alias(
            "message"
        ),
        F.from_json(F.col("props"), MapType(StringType(), StringType())).alias("sdata"),
        F.array(F.lit("synthetic"), et).alias("tags"),
    )
    if len(_LOGS_MEMO) > 256:
        _LOGS_MEMO.clear()
    _LOGS_MEMO[id(events)] = (events, out)
    return out
