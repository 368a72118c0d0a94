"""patterndb <actions> / synthetic messages — behavior modeled on
modules/dbparser/tests/test_patterndb.c (action-on-match,
action-on-timeout, action-condition, rate-limited action, inherit
modes)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from syslog_ng_spark.operators.actions import (
    PdbAction,
    PdbRule,
    SyntheticMessage,
    apply_actions,
    load_patterndb_rules,
    patterndb_actions,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _logs(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(seconds=s), h, p, pid, m)
            for i, (s, h, p, pid, m) in enumerate(rows)
        ],
        "event_id long, ts timestamp, host string, program string, pid int, message string",
    )


# mirrors the shape of test_patterndb.h pdb_ruletest_skeleton
ACTION_XML = """<patterndb version='5' pub_date='2010-02-22'>
 <ruleset name='testset' id='1'>
  <rules>
    <rule provider='test' id='10b' class='violation' context-scope='program'
          context-id='${PID}' context-timeout='60'>
     <patterns><pattern>correlated-message-with-action-on-match</pattern></patterns>
     <actions>
       <action trigger='match'>
         <message>
           <values>
             <value name='MESSAGE'>generated-message-on-match</value>
             <value name='context-id'>${CONTEXT_ID}</value>
           </values>
           <tags><tag>correlated-msg-tag</tag></tags>
         </message>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='10c' class='violation' context-scope='program'
          context-id='${PID}' context-timeout='60'>
     <patterns><pattern>correlated-message-with-action-on-timeout</pattern></patterns>
     <actions>
       <action trigger='timeout'>
         <message>
           <values><value name='MESSAGE'>generated-message-on-timeout</value></values>
         </message>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='10d' class='violation' context-scope='program'
          context-id='${PID}' context-timeout='60'>
     <patterns><pattern>correlated-message-with-action-condition</pattern></patterns>
     <actions>
       <action trigger='match' condition='"${PID}" ne "23"'>
         <message>
           <values><value name='MESSAGE'>not-generated-message</value></values>
         </message>
       </action>
       <action trigger='match' condition='"${PID}" eq "23"'>
         <message>
           <values><value name='MESSAGE'>generated-message-on-condition</value></values>
         </message>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='10e' class='violation' context-scope='program'
          context-id='${PID}' context-timeout='60'>
     <patterns><pattern>correlated-message-with-rate-limited-action</pattern></patterns>
     <actions>
       <action trigger='match' rate='1/60'>
         <message>
           <values><value name='MESSAGE'>generated-message-rate-limit</value></values>
         </message>
       </action>
     </actions>
    </rule>
  </rules>
 </ruleset>
</patterndb>"""


def test_loader_parses_actions():
    rules = load_patterndb_rules(ACTION_XML)
    assert [r.rule_id for r in rules] == ["10b", "10c", "10d", "10e"]
    assert rules[0].actions[0].trigger == "match"
    assert rules[0].actions[0].message.values["MESSAGE"] == "generated-message-on-match"
    assert rules[0].actions[0].message.tags == ["correlated-msg-tag"]
    assert rules[1].actions[0].trigger == "timeout"
    assert rules[2].actions[0].condition == '"${PID}" ne "23"'
    assert rules[3].actions[0].rate == (1, 60)
    assert rules[0].context_id == "${PID}"
    assert rules[0].context_timeout == 60


def test_action_on_match_emits_synthetic_message(spark):
    rules = load_patterndb_rules(ACTION_XML)
    df = _logs(spark, [(0, "h1", "prog1", 23, "correlated-message-with-action-on-match")])
    out = patterndb_actions(df, rules, order_tiebreak="event_id").collect()
    assert len(out) == 1
    r = out[0]
    assert r.message == "generated-message-on-match"
    assert r["context-id"] == "23"
    assert r.synthetic_tags == ["correlated-msg-tag"]
    assert r.trigger == "match"
    # inherit defaults to none: host unset, ts = triggering stamp
    assert r.host == ""
    assert r.ts == T0


def test_action_on_timeout_one_message_per_context(spark):
    rules = load_patterndb_rules(ACTION_XML)
    # two contexts for pid 23 (gap > 60s), one for pid 24
    df = _logs(
        spark,
        [
            (0, "h1", "prog1", 23, "correlated-message-with-action-on-timeout"),
            (10, "h1", "prog1", 23, "correlated-message-with-action-on-timeout"),
            (200, "h1", "prog1", 23, "correlated-message-with-action-on-timeout"),
            (5, "h1", "prog1", 24, "correlated-message-with-action-on-timeout"),
        ],
    )
    out = patterndb_actions(df, rules, order_tiebreak="event_id")
    rows = sorted(out.collect(), key=lambda r: r.ts)
    assert len(rows) == 3
    assert all(r.message == "generated-message-on-timeout" for r in rows)
    assert all(r.trigger == "timeout" for r in rows)
    # timestamp = the context's LAST message stamp
    assert rows[0].ts == T0 + dt.timedelta(seconds=5)
    assert rows[1].ts == T0 + dt.timedelta(seconds=10)
    assert rows[2].ts == T0 + dt.timedelta(seconds=200)


def test_action_condition_selects_branch(spark):
    rules = load_patterndb_rules(ACTION_XML)
    df = _logs(spark, [(0, "h1", "prog1", 23, "correlated-message-with-action-condition")])
    out = patterndb_actions(df, rules, order_tiebreak="event_id").collect()
    assert len(out) == 1
    assert out[0].message == "generated-message-on-condition"


def test_rate_limited_action(spark):
    rules = load_patterndb_rules(ACTION_XML)
    # 4 matches in the same 60s window + 1 after -> 2 emissions
    df = _logs(
        spark,
        [
            (0, "h1", "prog1", 23, "correlated-message-with-rate-limited-action"),
            (1, "h1", "prog1", 23, "correlated-message-with-rate-limited-action"),
            (2, "h1", "prog1", 23, "correlated-message-with-rate-limited-action"),
            (3, "h1", "prog1", 23, "correlated-message-with-rate-limited-action"),
            (120, "h1", "prog1", 23, "correlated-message-with-rate-limited-action"),
        ],
    )
    out = patterndb_actions(df, rules, order_tiebreak="event_id").collect()
    assert len(out) == 2
    assert sorted(r.ts for r in out) == [T0, T0 + dt.timedelta(seconds=120)]


def test_inherit_last_message_copies_columns(spark):
    rule = PdbRule(
        rule_id="r1",
        cls="violation",
        patterns=["boom @NUMBER:code@"],
        actions=[
            PdbAction(
                message=SyntheticMessage(
                    values={"MESSAGE": "escalated code=${code}"},
                    inherit="last-message",
                )
            )
        ],
    )
    df = _logs(spark, [(0, "h9", "prog1", 7, "boom 42")])
    out = patterndb_actions(df, [rule], order_tiebreak="event_id").collect()
    assert len(out) == 1
    # inherited columns survive; MESSAGE overridden by the template
    assert out[0].host == "h9"
    assert out[0].pid == 7
    assert out[0].message == "escalated code=42"


def test_context_length_function(spark):
    rule = PdbRule(
        rule_id="r1",
        cls="violation",
        patterns=["tick"],
        context_id="${PID}",
        context_timeout=60,
        actions=[
            PdbAction(
                trigger="timeout",
                message=SyntheticMessage(values={"MESSAGE": "n=$(context-length)"}),
            )
        ],
    )
    df = _logs(
        spark,
        [(0, "h1", "p", 1, "tick"), (5, "h1", "p", 1, "tick"), (9, "h1", "p", 1, "tick")],
    )
    out = patterndb_actions(df, [rule], order_tiebreak="event_id").collect()
    assert len(out) == 1
    assert out[0].message == "n=3"


def test_apply_actions_unions_stream(spark):
    rules = load_patterndb_rules(ACTION_XML)
    df = _logs(spark, [(0, "h1", "prog1", 23, "correlated-message-with-action-on-match")])
    out = apply_actions(df, rules, order_tiebreak="event_id")
    rows = sorted(out.collect(), key=lambda r: r.synthetic)
    assert len(rows) == 2
    assert rows[0].synthetic is False and rows[0].message.endswith("action-on-match")
    assert rows[1].synthetic is True and rows[1].message == "generated-message-on-match"
    # original rows carry unset ('') extra value columns
    assert rows[0]["context-id"] == ""


def test_filter_style_condition(spark):
    rule = PdbRule(
        rule_id="r1",
        cls="violation",
        patterns=["ev @ANYSTRING:rest@"],
        actions=[
            PdbAction(
                condition='message("crit")',
                message=SyntheticMessage(values={"MESSAGE": "flagged"}),
            )
        ],
    )
    df = _logs(spark, [(0, "h", "p", 1, "ev crit x"), (1, "h", "p", 1, "ev ok")])
    out = patterndb_actions(df, [rule], order_tiebreak="event_id").collect()
    assert len(out) == 1
    assert out[0].message == "flagged"


def test_streaming_timeout_action_emits_rendered_message(spark):
    """Two availableNow passes over one checkpoint: phase 2's
    far-future row pushes the watermark past phase 1's context
    timeout, firing the timeout action (reference:
    test_correlation_rule_with_action_on_timeout)."""
    import tempfile

    from syslog_ng_spark.streaming.stateful import patterndb_actions_stream

    rules = load_patterndb_rules(ACTION_XML)
    schema = "event_id long, ts timestamp, host string, program string, pid int, message string"

    def rows(specs):
        return [
            (i, T0 + dt.timedelta(seconds=s), h, p, pid, m)
            for i, (s, h, p, pid, m) in enumerate(specs)
        ]

    phase1 = rows(
        [
            (0, "h1", "prog1", 23, "correlated-message-with-action-on-timeout"),
            (10, "h1", "prog1", 23, "correlated-message-with-action-on-timeout"),
        ]
    )
    # the pusher must MATCH the rule: the watermark node sits after
    # the rule filter, so only matching rows advance event time there
    phase2 = rows([(86400, "h1", "prog1", 99, "correlated-message-with-action-on-timeout")])

    with tempfile.TemporaryDirectory() as d:
        def run_once():
            stream = spark.readStream.schema(schema).parquet(d + "/in")
            q = (
                patterndb_actions_stream(stream, rules, watermark="10 seconds")
                .writeStream.format("parquet")
                .option("path", d + "/out")
                .option("checkpointLocation", d + "/ck")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        spark.createDataFrame(phase1, schema).coalesce(1).write.mode("append").parquet(d + "/in")
        run_once()
        spark.createDataFrame(phase2, schema).coalesce(1).write.mode("append").parquet(d + "/in")
        run_once()
        out = [r for r in spark.read.parquet(d + "/out").collect() if r.trigger == "timeout"]

    assert len(out) == 1
    assert out[0].message == "generated-message-on-timeout"
    assert out[0].rule_id == "10c"
    # synthetic ts = the context's last message stamp
    assert out[0].ts == T0 + dt.timedelta(seconds=10)
