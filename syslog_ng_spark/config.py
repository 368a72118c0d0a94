"""Declarative pipeline config — the syslog-ng config analog.

Reference: a syslog-ng deployment is a config file of named sources,
parsers, filters, rewrites, destinations wired into log paths
(lib/cfg-tree.c). This module accepts the same shape as a plain dict
(JSON/YAML-friendly) and compiles it to a lazy DataFrame pipeline, so
a reference user can port a config block by transliteration:

    log = {
      "source": {"kind": "file", "path": "/logs/*.log"},
      "steps": [
        {"op": "parse-syslog", "flavor": "rfc3164", "year": 2024},
        {"op": "filter-severity", "max": "warning"},
        {"op": "rewrite-subst", "field": "message",
         "pattern": "secret=\\S+", "replacement": "secret=***"},
        {"op": "set-tag", "tag": "audited"},
      ],
      "destination": {"kind": "parquet", "path": "/out", "partition_by": ["host"]},
    }
    run_pipeline(spark, log)
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from syslog_ng_spark import sinks
from syslog_ng_spark.operators import filters, parsers, rewrite
from syslog_ng_spark.sources import files


def _source(spark: SparkSession, spec: Mapping) -> DataFrame:
    kind = spec["kind"]
    if kind == "file":
        return files.text_lines(spark, spec["path"], recursive=spec.get("recursive", False))
    if kind == "parquet":
        return files.parquet_table(spark, spec["path"])
    if kind == "csv":
        return files.csv_table(spark, spec["path"], schema=spec.get("schema"))
    if kind == "json":
        return files.json_table(spark, spec["path"], schema=spec.get("schema"))
    if kind == "systemd-journal":
        # system()/systemd-journal(): binary .journal files read
        # directly (r8), no libsystemd
        from syslog_ng_spark.sources.journal_binary import journal_binary_as_logs

        return journal_binary_as_logs(
            spark, spec["path"], prefix=spec.get("prefix", ".journald.")
        )
    raise ValueError(f"unknown source kind: {kind}")


def _step(df: DataFrame, spec: Mapping) -> DataFrame:
    op = spec["op"]
    if op == "parse-syslog":
        flavor = spec.get("flavor", "rfc3164")
        if flavor == "rfc5424":
            return parsers.syslog_parser_5424(df, raw=spec.get("column", "raw"))
        return parsers.syslog_parser_3164(
            df, raw=spec.get("column", "raw"), year=spec.get("year", 2024)
        )
    if op == "parse-csv":
        return parsers.csv_parser(df, spec["column"], spec["names"], sep=spec.get("sep", ","))
    if op == "parse-kv":
        if spec.get("quoted"):
            return parsers.kv_parser_quoted(df, spec["column"], target=spec.get("target", "kv"))
        return parsers.kv_parser(df, spec["column"], target=spec.get("target", "kv"))
    if op == "parse-json":
        return parsers.json_parser(df, spec["column"], target=spec.get("target", "sdata"))
    if op == "parse-date":
        return parsers.date_parser(df, spec["column"], spec["format"], target=spec.get("target", "ts"))
    if op == "classify":
        return parsers.pattern_parser(
            df, spec["column"], [tuple(r) for r in spec["rules"]],
            target=spec.get("target", "class"), default=spec.get("default", "unknown"),
        )
    if op == "filter-severity":
        return df.where(filters.severity_at_least(F.col("severity"), spec["max"]))
    if op == "filter-facility":
        return df.where(filters.facility_filter(F.col("facility"), *spec["facilities"]))
    if op == "filter-match":
        return df.where(filters.match_filter(F.col(spec.get("column", "message")), spec["pattern"]))
    if op == "filter-netmask":
        return df.where(filters.netmask_filter(F.col(spec["column"]), spec["cidr"]))
    if op == "filter-in-list":
        return df.where(filters.in_list_filter(F.col(spec["column"]), spec["values"]))
    if op == "multiline":
        # {"op": "multiline", "mode": "indented"|"prefix", "prefix": rx,
        #  "order": "line_no", "group": "path"}
        from syslog_ng_spark.operators.multiline import reassemble_multiline

        return reassemble_multiline(
            df,
            line_col=spec.get("column", "raw"),
            order_col=spec.get("order", "line_no"),
            group_col=spec.get("group"),
            mode=spec.get("mode", "indented"),
            prefix=spec.get("prefix"),
            suffix=spec.get("suffix"),
        )
    if op == "parse-patterndb":
        # {"op": "parse-patterndb", "rules": [[class, pattern], ...]}
        # or {"xml": "<patterndb>..."}
        from syslog_ng_spark.operators.patterndb import (
            load_patterndb_xml,
            patterndb_parse,
        )

        rules = (
            load_patterndb_xml(spec["xml"])
            if "xml" in spec
            else [tuple(r) for r in spec["rules"]]
        )
        return patterndb_parse(
            df,
            spec.get("column", "message"),
            rules,
            target=spec.get("target", "class"),
            default=spec.get("default", "unknown"),
        )
    if op == "suppress":
        from syslog_ng_spark.operators.correlate import suppress

        return suppress(
            df,
            spec.get("key", ["host", "message"]),
            ts=spec.get("ts", "ts"),
            seconds=spec.get("seconds", 30),
        )
    if op == "enrich-geoip":
        # {"op": "enrich-geoip", "ranges_path": parquet-with-
        #  start_int/end_int/attrs, "column": "ip"}
        from syslog_ng_spark.operators.enrich import geoip_range_enrich

        ranges = df.sparkSession.read.parquet(spec["ranges_path"])
        return geoip_range_enrich(df, ranges, ip_col=spec.get("column", "ip"))
    if op == "format":
        # render a syslog-ng template string per row (template.py);
        # the rewrite/destination-template analog:
        #   {"op": "format", "template": "$ISODATE $HOST $MSG",
        #    "target": "line"}
        from syslog_ng_spark.template import template_format

        return template_format(df, spec["template"], target=spec.get("target", "rendered"))
    if op == "rewrite-set":
        # set()'s value IS a template in the reference (use $$ to
        # write a literal dollar); {"literal": true} opts out for
        # values that must never be expanded
        value = spec["value"]
        if isinstance(value, str) and "$" in value and not spec.get("literal"):
            from syslog_ng_spark.template import compile_template

            return rewrite.set_field(df, spec["field"], compile_template(value, df))
        return rewrite.set_field(df, spec["field"], F.lit(value))
    if op == "rewrite-subst":
        return rewrite.subst(df, spec["field"], spec["pattern"], spec["replacement"])
    if op == "rewrite-unset":
        return rewrite.unset(df, *spec["fields"])
    if op == "set-tag":
        return rewrite.set_tag(df, spec["tag"]) if "tags" in df.columns else df.withColumn(
            "tags", F.array(F.lit(spec["tag"]))
        )
    if op == "set-severity":
        return rewrite.set_severity(df, spec["level"])
    raise ValueError(f"unknown step op: {op}")


def _destination(df: DataFrame, spec: Mapping) -> None:
    kind = spec["kind"]
    if kind == "parquet":
        sinks.write_parquet(df, spec["path"], partition_by=spec.get("partition_by", ()))
    elif kind == "csv":
        sinks.write_csv(df, spec["path"])
    elif kind == "json":
        sinks.write_json(df, spec["path"])
    elif kind == "text":
        sinks.write_text(df, spec["path"], column=spec.get("column", "raw"))
    elif kind == "network":
        # network()/syslog() with optional transport(tls) tls(...) (r8)
        tls_spec = spec.get("tls")
        tls = sinks.TlsOptions(**tls_spec) if tls_spec else None
        sinks.NetworkDestination(
            targets=[tuple(t) for t in spec["targets"]],
            template=spec.get("template", "$MESSAGE"),
            framing=spec.get("framing", "newline"),
            tls=tls,
        ).write(df)
    elif kind == "kafka":
        sinks.kafka_sink(
            df,
            spec["brokers"],
            message=spec.get("message", "$MESSAGE"),
            key=spec.get("key"),
            topic=spec.get("topic", "syslog-ng"),
            fallback_topic=spec.get("fallback_topic"),
        )
    elif kind == "none":
        pass
    else:
        raise ValueError(f"unknown destination kind: {kind}")


def build_pipeline(spark: SparkSession, spec: Mapping) -> DataFrame:
    """Compile a config dict to a DataFrame (lazily; no execution)."""
    df = _source(spark, spec["source"])
    for step in spec.get("steps", ()):
        df = _step(df, step)
    return df


def run_pipeline(spark: SparkSession, spec: Mapping) -> DataFrame:
    """Compile and execute: writes the destination, returns the frame."""
    df = build_pipeline(spark, spec)
    if "destination" in spec:
        _destination(df, spec["destination"])
    return df
