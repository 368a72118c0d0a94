"""Application parsers from the reference's SCL library — the
config-block parsers real deployments enable per app.

Reference: /root/reference/scl/apache/apache.conf
(apache-accesslog-parser: csv with '""'/'[]' quote pairs → the
logstash-like schema, rawrequest split, %d/%b/%Y:%H:%M:%S %z date,
HTTP/x → x), /root/reference/scl/cisco/plugin.conf (cisco-parser:
optional seqno, optional '*' clock-unsynced mark, multi-format
timestamp, %FAC-SEV-MNEMONIC triplet incl. the FAC-subfac-SEV
4-part form), /root/reference/scl/iptables/iptables.conf
(iptables-parser: kv-parser under a '.iptables.' prefix).

All pure Catalyst regexp/map expressions — one pass per line, no
UDFs; every parser returns typed columns so downstream filters push
into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# vhost:port prefix is optional (vhost_combined/vhost_common formats);
# referrer/agent tail is optional (common vs combined)
_APACHE_RE = (
    r"^(?:([A-Za-z0-9\-\._]+):(\d+) )?"  # 1 vhost, 2 port
    r"(\S+) (\S+) (\S+) "  # 3 clientip, 4 ident, 5 auth
    r"\[([^\]]+)\] "  # 6 timestamp
    r'"([^"]*)" '  # 7 rawrequest
    r"(\d{3}) (\S+)"  # 8 response, 9 bytes ('-' allowed)
    r'(?: "([^"]*)" "([^"]*)")?$'  # 10 referrer, 11 agent
)


def apache_accesslog_parser(
    df: DataFrame, col: str = "message", prefix: str = "apache_"
) -> DataFrame:
    """apache-accesslog-parser(): common / combined / vhost_common /
    vhost_combined access-log lines → the logstash-like schema the
    reference produces (scl/apache/apache.conf): clientip, ident,
    auth, ts (parsed %d/%b/%Y:%H:%M:%S %z), verb, request,
    httpversion (HTTP/ stripped, the conf's subst), response int,
    bytes long ('-' → null), referrer, agent, vhost, port. Lines that
    don't match yield nulls (the reference's drop-invalid is a
    .where(col(prefix+'response').isNotNull()) away)."""

    def g(i: int) -> Column:
        return F.regexp_extract(F.col(col), _APACHE_RE, i)

    def nullable(c: Column) -> Column:
        return F.when(c != "", c)

    raw = nullable(g(7))
    return (
        df.withColumn(prefix + "vhost", nullable(g(1)))
        .withColumn(prefix + "port", nullable(g(2)).cast("int"))
        .withColumn(prefix + "clientip", nullable(g(3)))
        .withColumn(prefix + "ident", nullable(g(4)))
        .withColumn(prefix + "auth", nullable(g(5)))
        .withColumn(
            prefix + "ts",
            F.try_to_timestamp(nullable(g(6)), F.lit("dd/MMM/yyyy:HH:mm:ss Z")),
        )
        .withColumn(prefix + "verb", F.regexp_extract(raw, r"^(\S+)", 1))
        .withColumn(prefix + "request", F.regexp_extract(raw, r"^\S+ (\S+)", 1))
        .withColumn(
            prefix + "httpversion",
            # the conf's rewrite: subst("^HTTP/(.*)$", "$1")
            F.regexp_replace(F.regexp_extract(raw, r"^\S+ \S+ (\S+)$", 1), "^HTTP/", ""),
        )
        .withColumn(prefix + "response", nullable(g(8)).cast("int"))
        .withColumn(
            prefix + "bytes",
            F.when(g(9) == "-", F.lit(None).cast("long")).otherwise(
                nullable(g(9)).cast("long")
            ),
        )
        .withColumn(prefix + "referrer", nullable(g(10)))
        .withColumn(prefix + "agent", nullable(g(11)))
    )


# optional '<pri>', optional 'seq: ', optional '*'/'.' (clock not
# synced / drifted), timestamp up to the ': %' boundary, then the
# %TRIPLET: message tail
_CISCO_RE = (
    r"^(?:<(\d+)>)?"  # 1 pri
    r"(?:(\d+): )?"  # 2 seqno
    r"(?:[*.]?"
    r"([A-Za-z]{3} [0-9 ]?\d(?: \d{4})? \d{2}:\d{2}:\d{2}(?:\.\d{1,3})?(?: (?:AM|PM))?)"
    r"(?: [A-Z]{1,4})?: )?"  # 3 timestamp (optional tz abbrev eaten)
    r"%([A-Z0-9_]+)-"  # 4 facility
    r"(?:([A-Z0-9_]+)-)?"  # 5 optional subfacility
    r"(\d)-"  # 6 severity
    r"([A-Z0-9_]+): "  # 7 mnemonic
    r"(.*)$"  # 8 message
)

_CISCO_TS_FORMATS = (
    # the reference's date-parser candidate list, strptime → JVM patterns
    "MMM d hh:mm:ss a",
    "MMM d HH:mm:ss.SSS",
    "MMM d HH:mm:ss",
    "MMM d yyyy HH:mm:ss.SSS",
    "MMM d yyyy HH:mm:ss",
)


def cisco_parser(df: DataFrame, col: str = "raw", prefix: str = "cisco_") -> DataFrame:
    """cisco-parser() (scl/cisco/plugin.conf): IOS-style syslog —
    optional <pri>, optional sequence number, optional timestamp with
    a leading '*' / '.' clock-sync mark, then the %FACILITY-SEVERITY-
    MNEMONIC triplet (or the 4-part FACILITY-subfac-SEVERITY form,
    folded into facility as 'FAC-subfac' exactly like the conf's
    set("${facility}-$4")). Produces pri-derived facility/severity
    ints too, and tries the reference's timestamp format candidates
    in order (first parse wins, like date-parser's format list)."""

    def g(i: int) -> Column:
        return F.regexp_extract(F.col(col), _CISCO_RE, i)

    def nullable(c: Column) -> Column:
        return F.when(c != "", c)

    pri = nullable(g(1)).cast("int")
    # IOS pads single-digit days with a space ('Mar  1'); collapse runs
    # so one 'MMM d' pattern covers both paddings
    ts_txt = F.regexp_replace(nullable(g(3)), " +", " ")
    parsed_ts = F.coalesce(
        *[F.try_to_timestamp(ts_txt, F.lit(fmt)) for fmt in _CISCO_TS_FORMATS]
    )
    fac = nullable(g(4))
    subfac = nullable(g(5))
    return (
        df.withColumn(prefix + "pri", pri)
        .withColumn(prefix + "facility_num", (pri / 8).cast("int"))
        .withColumn(prefix + "severity_num", pri % 8)
        .withColumn(prefix + "seqno", nullable(g(2)).cast("long"))
        .withColumn(prefix + "ts", parsed_ts)
        .withColumn(
            prefix + "facility",
            F.when(subfac.isNotNull(), F.concat_ws("-", fac, subfac)).otherwise(fac),
        )
        .withColumn(prefix + "severity", nullable(g(6)).cast("int"))
        .withColumn(prefix + "mnemonic", nullable(g(7)))
        .withColumn(prefix + "message", nullable(g(8)))
    )


def iptables_parser(
    df: DataFrame, col: str = "message", target: str = "sdata", prefix: str = ".iptables."
) -> DataFrame:
    """iptables-parser() (scl/iptables/iptables.conf): the kernel's
    netfilter log line ('IN=eth0 OUT= SRC=1.2.3.4 ... PROTO=TCP
    SPT=51812 ...') through the kv-parser with every key landed under
    the '.iptables.' prefix. Valueless tokens like flag words ('DF',
    'SYN') are not k=v pairs and are skipped, matching kv-scanner;
    empty values ('OUT=') survive as empty strings."""
    from syslog_ng_spark.operators.parsers import kv_parser

    parsed = kv_parser(df, col, target="_kv_tmp")
    pruned = F.map_filter(F.col("_kv_tmp"), lambda k, v: v.isNotNull())
    return parsed.withColumn(
        target, F.transform_keys(pruned, lambda k, v: F.concat(F.lit(prefix), k))
    ).drop("_kv_tmp")
