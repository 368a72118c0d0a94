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


# mirrors test_patterndb.h rules 12/13 (create-context + a rule that
# joins the created context) — test_correlation_rule_with_create_context
CREATE_CONTEXT_XML = """<patterndb version='5' pub_date='2010-02-22'>
 <ruleset name='testset' id='1'>
  <rules>
    <rule provider='test' id='12' class='violation'>
     <patterns><pattern>simple-message-with-action-to-create-context</pattern></patterns>
     <actions>
       <action trigger='match'>
         <create-context context-id='1000' context-timeout='60' context-scope='program'>
           <message inherit-properties='context'>
             <values><value name='MESSAGE'>context message</value></values>
           </message>
         </create-context>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='13' class='violation' context-id='1000'
          context-timeout='60' context-scope='program'>
     <patterns><pattern>ctx-user-message</pattern></patterns>
     <actions>
       <action trigger='timeout'>
         <message inherit-properties='last-message'>
           <values><value name='MESSAGE'>closed n=$(context-length) last=${MESSAGE}</value></values>
         </message>
       </action>
     </actions>
    </rule>
  </rules>
 </ruleset>
</patterndb>"""


def test_loader_parses_create_context():
    rules = load_patterndb_rules(CREATE_CONTEXT_XML)
    act = rules[0].actions[0]
    assert act.create_context is not None
    assert act.create_context.id_template == "1000"
    assert act.create_context.timeout == 60
    assert act.create_context.scope == "program"
    assert act.message.values["MESSAGE"] == "context message"
    assert act.message.inherit == "context"


def test_create_context_seeds_shared_context(spark):
    """Rule 12 creates context 1000 with a seed message; rule 13's
    message joins it; on expiry the LAST rule to touch the context
    (13) fires its timeout action over the shared context — so
    $(context-length) counts the seed too."""
    rules = load_patterndb_rules(CREATE_CONTEXT_XML)
    df = _logs(
        spark,
        [
            (0, "h1", "prog1", 23, "simple-message-with-action-to-create-context"),
            (10, "h1", "prog1", 23, "ctx-user-message"),
        ],
    )
    out = patterndb_actions(df, rules, order_tiebreak="event_id").collect()
    assert len(out) == 1
    r = out[0]
    assert r.rule_id == "13" and r.trigger == "timeout"
    assert r.message == "closed n=2 last=ctx-user-message"
    assert r.host == "h1"  # inherit last-message
    assert r.ts == T0 + dt.timedelta(seconds=10)


def test_create_context_without_joiner_emits_nothing(spark):
    """A context seeded by rule 12 whose last (only) message is the
    seed is owned by rule 12 (patterndb.c:629 context->rule), which
    has no timeout action — nothing fires."""
    rules = load_patterndb_rules(CREATE_CONTEXT_XML)
    df = _logs(
        spark, [(0, "h1", "prog1", 23, "simple-message-with-action-to-create-context")]
    )
    out = patterndb_actions(df, rules, order_tiebreak="event_id").collect()
    assert out == []


def test_create_context_seed_inherits_triggering_message(spark):
    """The seed clones the triggering message (inherit context with no
    triggering context == synthetic_message_generate_without_context);
    a timeout whose last message IS a joiner that arrived before the
    seed's timeout window closed sees the seed's values via
    context-length; here we assert the seeded context groups under the
    creating message's scope values."""
    rules = load_patterndb_rules(CREATE_CONTEXT_XML)
    df = _logs(
        spark,
        [
            (0, "h1", "prog1", 23, "simple-message-with-action-to-create-context"),
            # different program => different scope key => separate
            # context that has no seed
            (5, "h1", "prog2", 23, "ctx-user-message"),
        ],
    )
    out = patterndb_actions(df, rules, order_tiebreak="event_id").collect()
    assert len(out) == 1
    assert out[0].message == "closed n=1 last=ctx-user-message"


def test_inherit_context_merges_sdata(spark):
    """inherit-properties='context' union-merges the sdata map across
    the context, the latest setter of each key winning
    (synthetic-message.c:168 + logmsg.c:log_msg_merge_context)."""
    rule = PdbRule(
        rule_id="r1",
        cls="violation",
        patterns=["tick"],
        context_id="${PID}",
        context_timeout=60,
        actions=[
            PdbAction(
                trigger="timeout",
                message=SyntheticMessage(
                    values={"MESSAGE": "merged"}, inherit="context"
                ),
            )
        ],
    )
    df = spark.createDataFrame(
        [
            (0, T0, "h1", "p", 1, "tick", {"a": "1", "b": "1"}),
            (1, T0 + dt.timedelta(seconds=5), "h1", "p", 1, "tick", {"b": "2", "c": "2"}),
            (2, T0 + dt.timedelta(seconds=9), "h1", "p", 1, "tick", {"a": "3"}),
        ],
        "event_id long, ts timestamp, host string, program string, pid int, "
        "message string, sdata map<string,string>",
    )
    out = patterndb_actions(df, [rule], order_tiebreak="event_id").collect()
    assert len(out) == 1
    assert out[0].message == "merged"
    assert dict(out[0].sdata) == {"a": "3", "b": "2", "c": "2"}
    # inherit last-message does NOT merge: same input, different mode
    rule.actions[0].message.inherit = "last-message"
    out2 = patterndb_actions(df, [rule], order_tiebreak="event_id").collect()
    assert dict(out2[0].sdata) == {"a": "3"}


# parity ruleset: a context-less match action, a correlation rule with
# a timeout action (inherit context => sdata merge), and a
# create-context rule seeding that correlation id
PARITY_XML = """<patterndb version='5' pub_date='2010-02-22'>
 <ruleset name='parity' id='1'>
  <rules>
    <rule provider='test' id='pm' class='violation'>
     <patterns><pattern>pdb-par-match @ANYSTRING:what@</pattern></patterns>
     <actions>
       <action trigger='match'>
         <message inherit-properties='TRUE'>
           <values><value name='MESSAGE'>alert pid=${PID} what=${what}</value></values>
         </message>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='p12' class='violation'>
     <patterns><pattern>pdb-par-start</pattern></patterns>
     <actions>
       <action trigger='match'>
         <create-context context-id='${PID}-cc' context-timeout='60' context-scope='program'>
           <message inherit-properties='context'>
             <values><value name='MESSAGE'>seed</value></values>
           </message>
         </create-context>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='p13' class='violation' context-id='${PID}-cc'
          context-timeout='60' context-scope='program'>
     <patterns><pattern>pdb-par-evt @ANYSTRING:what@</pattern></patterns>
     <actions>
       <action trigger='timeout'>
         <message inherit-properties='context'>
           <values><value name='MESSAGE'>done n=$(context-length)</value></values>
         </message>
       </action>
     </actions>
    </rule>
  </rules>
 </ruleset>
</patterndb>"""

PARITY_SCHEMA = (
    "event_id long, ts timestamp, host string, program string, pid int, "
    "message string, sdata map<string,string>"
)


def _parity_rows():
    return [
        (0, T0, "h1", "prog1", 23, "pdb-par-start", {"src": "start"}),
        (1, T0 + dt.timedelta(seconds=10), "h1", "prog1", 23, "pdb-par-evt a", {"k1": "v1"}),
        (2, T0 + dt.timedelta(seconds=20), "h1", "prog1", 23, "pdb-par-evt b", {"k2": "v2"}),
        (3, T0 + dt.timedelta(seconds=2), "h2", "prog1", 5, "pdb-par-match boom", {"m": "x"}),
    ]


def _canon(rows):
    out = []
    for r in rows:
        d = r.asDict()
        d["sdata"] = tuple(sorted((d["sdata"] or {}).items()))
        d["synthetic_tags"] = tuple(d["synthetic_tags"] or ())
        out.append(tuple(d[k] for k in sorted(d)))
    return sorted(out)


def test_batch_stream_parity_for_actions(spark):
    """The streaming operator must emit exactly the batch operator's
    rows for the same corpus replayed through a file stream — the
    pattern the reference's own correlation tests use
    (modules/dbparser/tests/test_patterndb.c with _advance_time)."""
    import tempfile

    from syslog_ng_spark.streaming.stateful import patterndb_actions_stream

    rules = load_patterndb_rules(PARITY_XML)
    batch_df = spark.createDataFrame(_parity_rows(), PARITY_SCHEMA)
    batch_out = patterndb_actions(batch_df, rules, order_tiebreak="event_id").collect()
    # sanity: one match alert + one merged context summary
    msgs = sorted(r.message for r in batch_out)
    assert msgs == ["alert pid=5 what=boom", "done n=3"]
    done = [r for r in batch_out if r.rule_id == "p13"][0]
    assert dict(done.sdata) == {"src": "start", "k1": "v1", "k2": "v2"}

    # watermark pusher: matches p13 under a different pid so it starts
    # its own (never-expiring) context and emits nothing itself
    pusher = [(9, T0 + dt.timedelta(seconds=86400), "h9", "prog9", 99,
               "pdb-par-evt push", {})]

    with tempfile.TemporaryDirectory() as d:
        def run_once():
            stream = spark.readStream.schema(PARITY_SCHEMA).parquet(d + "/in")
            q = (
                patterndb_actions_stream(
                    stream, rules, watermark="10 seconds", order_tiebreak="event_id"
                )
                .select(*[c for c in batch_out[0].asDict()])
                .writeStream.format("parquet")
                .option("path", d + "/out")
                .option("checkpointLocation", d + "/ck")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        spark.createDataFrame(_parity_rows(), PARITY_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d + "/in")
        run_once()
        spark.createDataFrame(pusher, PARITY_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(d + "/in")
        run_once()
        stream_out = [
            r for r in spark.read.parquet(d + "/out").collect() if r.pid != 99
        ]

    assert _canon(stream_out) == _canon(batch_out)


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


# ---- r11: $(grep)/@N/$CONTEXT_ID against live context state ----------

GREP_CTX_XML = """<patterndb version='5' pub_date='2010-02-22'>
 <ruleset name='grepctx' id='9'>
  <rules>
    <rule provider='test' id='gc1' class='ctx' context-id='${PID}-gc'
          context-timeout='60' context-scope='program'>
     <patterns><pattern>gctx @ANYSTRING:what@</pattern></patterns>
     <actions>
       <action trigger='timeout'>
         <message inherit-properties='TRUE'>
           <values>
             <value name='MESSAGE'>ctx=${CONTEXT_ID} n=$(context-length) hits=$(grep ('${what}' ne 'skip') ${what}) prev=${what}@1</value>
           </values>
         </message>
       </action>
     </actions>
    </rule>
  </rules>
 </ruleset>
</patterndb>"""

GREP_SCHEMA = (
    "event_id long, ts timestamp, host string, program string, pid int, "
    "message string"
)


def _grep_rows():
    return [
        (0, T0, "h1", "prog1", 7, "gctx alpha"),
        (1, T0 + dt.timedelta(seconds=5), "h1", "prog1", 7, "gctx skip"),
        (2, T0 + dt.timedelta(seconds=9), "h1", "prog1", 7, "gctx gamma"),
    ]


def test_batch_grep_over_context(spark):
    """$(grep (cond) $val), $(context-length), ${NAME}@N and
    $CONTEXT_ID all evaluate against the real collected context in a
    timeout action (modules/dbparser/context-funcs.c) — the context is
    the three-message session, in event order."""
    rules = load_patterndb_rules(GREP_CTX_XML)
    df = spark.createDataFrame(_grep_rows(), GREP_SCHEMA)
    out = patterndb_actions(df, rules, order_tiebreak="event_id").collect()
    assert len(out) == 1
    # @1 = one back from the latest context message ('skip')
    assert out[0].message == "ctx=7-gc n=3 hits=alpha,gamma prev=skip"


def test_stream_grep_over_context_parity(spark):
    """Batch ↔ stream parity for context-evaluating trigger templates:
    the streaming pool (collect_context) must render the identical
    message."""
    import tempfile

    from syslog_ng_spark.streaming.stateful import patterndb_actions_stream

    rules = load_patterndb_rules(GREP_CTX_XML)
    batch_msg = patterndb_actions(
        spark.createDataFrame(_grep_rows(), GREP_SCHEMA), rules,
        order_tiebreak="event_id",
    ).collect()[0].message

    pusher = [(9, T0 + dt.timedelta(seconds=86400), "h9", "prog9", 99, "gctx push")]
    with tempfile.TemporaryDirectory() as d:
        def run_once():
            stream = spark.readStream.schema(GREP_SCHEMA).parquet(d + "/in")
            q = (
                patterndb_actions_stream(
                    stream, rules, watermark="10 seconds",
                    order_tiebreak="event_id",
                )
                .writeStream.format("parquet")
                .option("path", d + "/out")
                .option("checkpointLocation", d + "/ck")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        spark.createDataFrame(_grep_rows(), GREP_SCHEMA).coalesce(1).write.mode(
            "append").parquet(d + "/in")
        run_once()
        spark.createDataFrame(pusher, GREP_SCHEMA).coalesce(1).write.mode(
            "append").parquet(d + "/in")
        run_once()
        out = [r for r in spark.read.parquet(d + "/out").collect() if r.pid != 99]

    assert len(out) == 1
    assert out[0].message == batch_msg


def test_stream_context_accumulates_across_batches_in_event_order(spark):
    """collect_context soak: one context fed across three micro-batches
    with interleaved event times — the emitted context list must hold
    EVERY message in event order (the state rides micro-batches as
    JSON and sorts stably at emit)."""
    import tempfile

    from syslog_ng_spark.streaming.stateful import patterndb_actions_stream

    rules = load_patterndb_rules(GREP_CTX_XML)
    n = 90
    # event times interleave across batches: batch b carries seconds
    # b, b+3, b+6, ... so no batch is wholly before another (the
    # 10-minute watermark keeps the interleaved arrivals from being
    # dropped as late — this test is about state ORDER, not lateness)
    batches = [
        [
            (s, T0 + dt.timedelta(seconds=s), "h1", "prog1", 5, f"gctx m{s:03d}")
            for s in range(b, n, 3)
        ]
        for b in range(3)
    ]
    pusher = [(9999, T0 + dt.timedelta(seconds=86400), "h9", "prog9", 99, "gctx push")]

    with tempfile.TemporaryDirectory() as d:
        def run_once():
            stream = spark.readStream.schema(GREP_SCHEMA).parquet(d + "/in")
            q = (
                patterndb_actions_stream(
                    stream, rules, watermark="10 minutes", order_tiebreak="event_id"
                )
                .writeStream.format("parquet")
                .option("path", d + "/out")
                .option("checkpointLocation", d + "/ck")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        for rows in batches + [pusher]:
            spark.createDataFrame(rows, GREP_SCHEMA).coalesce(1).write.mode(
                "append").parquet(d + "/in")
            run_once()
        out = [r for r in spark.read.parquet(d + "/out").collect() if r.pid != 99]

    assert len(out) == 1
    msg = out[0].message
    assert f"n={n}" in msg
    # $(grep) renders the matching context rows in EVENT order — the
    # hits list must be m000..m089 sorted, despite batch interleaving
    hits = msg.split("hits=")[1].split(" prev=")[0].split(",")
    assert hits == [f"m{s:03d}" for s in range(n)]
    assert msg.endswith(f"prev=m{n - 2:03d}")


# ---------------------------------------------------------------------------
# timeout-triggered create-context: context chaining on expiry (r12)
# patterndb.c pattern_db_expire_entry -> _execute_action_create_context
# ---------------------------------------------------------------------------

CHAIN_XML = """<patterndb version='5' pub_date='2010-02-22'>
 <ruleset name='chainset' id='2'>
  <rules>
    <rule provider='test' id='20' class='violation' context-scope='program'
          context-id='login-${PID}' context-timeout='10'>
     <patterns><pattern>user login</pattern></patterns>
     <actions>
       <action trigger='timeout' condition='"${MESSAGE}" eq "user login"'>
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
           <values><value name='MESSAGE'>alert n=$(context-length) last=${MESSAGE}</value></values>
         </message>
       </action>
     </actions>
    </rule>
  </rules>
 </ruleset>
</patterndb>"""


def test_timeout_create_context_chains_and_later_match_joins(spark):
    """An expiring context seeds a NEW context (trigger='timeout'
    create-context); a later message joins the seeded context; its
    expiry fires the joining rule's timeout actions with the full
    chained context ($(context-length) counts seed + joiner)."""
    rules = load_patterndb_rules(CHAIN_XML)
    df = _logs(spark, [
        (0, "h1", "p1", 23, "user login"),
        (50, "h1", "p1", 23, "suspicious activity"),
    ])
    out = patterndb_actions(df, rules, order_tiebreak="event_id").collect()
    assert len(out) == 1
    r = out[0]
    assert r.message == "alert n=2 last=suspicious activity"
    assert r.rule_id == "21" and r.trigger == "timeout"
    # expiry stamp: the joiner's ts (last message of the watch context)
    assert r.ts == T0 + dt.timedelta(seconds=50)


def test_timeout_create_context_no_joiner_owner_keeps_chain_rule(spark):
    """Without a joiner the seeded context expires owned by the
    seeding rule; its only timeout action is the condition-gated
    create-context, whose condition fails on the seed message, so the
    chain terminates and only the suspicious pid alerts."""
    rules = load_patterndb_rules(CHAIN_XML)
    # pid 23 logs in, nothing suspicious follows; pid 7 has both
    df = _logs(spark, [
        (0, "h1", "p1", 23, "user login"),
        (0, "h1", "p1", 7, "user login"),
        (30, "h1", "p1", 7, "suspicious activity"),
    ])
    out = patterndb_actions(df, rules, order_tiebreak="event_id").collect()
    # pid 23's watch context expires seed-only, owned by rule 20; the
    # chain action's condition ("MESSAGE eq user login") fails on the
    # seed message, so the chain terminates without re-seeding
    alerts = [r for r in out if r.rule_id == "21"]
    assert len(alerts) == 1
    assert alerts[0].message == "alert n=2 last=suspicious activity"


CHAIN_STOP_XML = """<patterndb version='5' pub_date='2010-02-22'>
 <ruleset name='stopset' id='3'>
  <rules>
    <rule provider='test' id='30' class='system' context-scope='program'
          context-id='b-${PID}' context-timeout='5'>
     <patterns><pattern>boot</pattern></patterns>
     <actions>
       <action trigger='timeout' condition='"${MESSAGE}" eq "boot"'>
         <create-context context-id='b2-${PID}' context-timeout='5'
                         context-scope='program'>
           <message inherit-properties='last-message'>
             <values><value name='MESSAGE'>stage2</value></values>
           </message>
         </create-context>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='31' class='system' context-scope='program'
          context-id='b2-${PID}' context-timeout='5'>
     <patterns><pattern>stage2-probe</pattern></patterns>
     <actions>
       <action trigger='timeout'>
         <message inherit-properties='last-message'>
           <values><value name='MESSAGE'>probe n=$(context-length)</value></values>
         </message>
       </action>
     </actions>
    </rule>
  </rules>
 </ruleset>
</patterndb>"""


def test_chain_condition_evaluates_against_seeded_context(spark):
    """The chain action's condition gates RE-seeding: it passes on the
    original context (last message 'boot') and fails on the seeded one
    (last message 'stage2'), so the chain is depth-1; a probe message
    joins the seeded b2 context and counts the seed."""
    rules = load_patterndb_rules(CHAIN_STOP_XML)
    df = _logs(spark, [
        (0, "h1", "p1", 5, "boot"),
        (7, "h1", "p1", 5, "stage2-probe"),  # b2 seeded at t=5; gap 2 < 5
    ])
    out = patterndb_actions(df, rules, order_tiebreak="event_id").collect()
    assert len(out) == 1
    assert out[0].message == "probe n=2"
    assert out[0].rule_id == "31"


def test_self_chaining_ruleset_raises_at_depth_cap(spark):
    """A timeout create-context that re-seeds the SAME context id with
    no stopping condition is unbounded (the reference would re-create
    it forever in real time); batch fails loudly at max_chain_depth."""
    import pytest as _pytest

    xml = CHAIN_STOP_XML.replace("b2-${PID}", "b-${PID}").replace(
        " condition='\"${MESSAGE}\" eq \"boot\"'", "")
    assert "condition" not in xml
    rules = load_patterndb_rules(xml)
    df = _logs(spark, [(0, "h1", "p1", 5, "boot")])
    with _pytest.raises(RuntimeError, match="did not converge"):
        patterndb_actions(df, rules, order_tiebreak="event_id").collect()


def test_chain_soak_many_contexts(spark):
    """Chained-expiry soak: 12 pids log in; half get a suspicious
    follow-up inside the watch window, half don't. Exactly one alert
    per suspicious pid, none for the quiet ones."""
    rules = load_patterndb_rules(CHAIN_XML)
    rows = []
    for pid in range(12):
        rows.append((pid % 4, "h1", "p1", pid, "user login"))
        if pid % 2 == 0:
            rows.append((60 + pid, "h1", "p1", pid, "suspicious activity"))
    df = _logs(spark, rows)
    out = patterndb_actions(df, rules, order_tiebreak="event_id").collect()
    alerts = sorted(r["pid"] for r in out if r.rule_id == "21")
    assert alerts == [0, 2, 4, 6, 8, 10]
    assert all(r.message.startswith("alert n=2") for r in out)


def test_loader_parses_timeout_create_context():
    rules = load_patterndb_rules(CHAIN_XML)
    act = rules[0].actions[0]
    assert act.trigger == "timeout"
    assert act.create_context is not None
    assert act.create_context.id_template == "watch-${PID}"
    assert act.create_context.timeout == 100


def test_streaming_chain_parity_with_batch(spark):
    """Streaming context chaining (chained_pool_context_stream): the
    same chained corpus replayed through a file stream emits exactly
    the batch operator's rows — the seeded watch context is created
    inside the scope group's state table at the login context's
    expiry, joined by the later message, and its own expiry renders
    via the joining rule."""
    import tempfile

    from syslog_ng_spark.streaming.stateful import patterndb_actions_stream

    rules = load_patterndb_rules(CHAIN_XML)
    corpus = [
        (0, "h1", "p1", 23, "user login"),
        (50, "h1", "p1", 23, "suspicious activity"),
        (0, "h1", "p1", 7, "user login"),  # never followed up: no alert
    ]
    schema = ("event_id long, ts timestamp, host string, program string, "
              "pid int, message string")
    batch_df = _logs(spark, corpus)
    batch_out = patterndb_actions(batch_df, rules, order_tiebreak="event_id").collect()
    assert sorted(r.message for r in batch_out) == [
        "alert n=2 last=suspicious activity"]

    pusher = [(9000, T0 + dt.timedelta(seconds=86400), "h1", "p1", 99,
               "user login")]

    with tempfile.TemporaryDirectory() as d:
        def run_once():
            stream = spark.readStream.schema(schema).parquet(d + "/in")
            q = (
                patterndb_actions_stream(
                    stream, rules, watermark="10 seconds",
                    order_tiebreak="event_id")
                .select(*[c for c in batch_out[0].asDict()])
                .writeStream.format("parquet")
                .option("path", d + "/out")
                .option("checkpointLocation", d + "/ck")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        rows = [(i, T0 + dt.timedelta(seconds=s), h, p, pid, m)
                for i, (s, h, p, pid, m) in enumerate(corpus)]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(d + "/in")
        run_once()
        spark.createDataFrame(pusher, schema).coalesce(1).write.mode(
            "append").parquet(d + "/in")
        run_once()
        stream_out = [r for r in spark.read.parquet(d + "/out").collect()
                      if r.pid != 99]

    def canon(rows):
        out = []
        for r in rows:
            d = r.asDict()
            d["synthetic_tags"] = tuple(d.get("synthetic_tags") or ())
            out.append(tuple(d[k] for k in sorted(d)))
        return sorted(out)

    assert canon(stream_out) == canon(batch_out)


def test_streaming_chain_nested_context_ref_raises(spark):
    """Context refs NESTED inside another template function have no
    per-row pre-render (the outer function would need the live
    context) — still loud, with the batch escape hatch. Top-level
    $(context-length)/$(grep)/@N seed templates are supported (r13,
    see the ctxref parity tests below)."""
    import pytest as _pytest

    from syslog_ng_spark.streaming.stateful import patterndb_actions_stream

    import tempfile

    xml = CHAIN_XML.replace(
        "watching ${PID}", "watching $(lowercase $(context-length))")
    rules = load_patterndb_rules(xml)
    schema = ("event_id long, ts timestamp, host string, program string, "
              "pid int, message string")
    with tempfile.TemporaryDirectory() as d:
        _logs(spark, [(0, "h1", "p1", 1, "user login")]).write.parquet(d + "/in")
        stream = spark.readStream.schema(schema).parquet(d + "/in")
        with _pytest.raises(NotImplementedError, match="batch mode"):
            patterndb_actions_stream(stream, rules, watermark="10 seconds")


def test_streaming_chain_across_micro_batches_soak(spark):
    """Chained-expiry soak: logins in batch 1, the seeded watch
    contexts created by expiries processed in batch 2 (where the acts
    arrive), final expiries flushed in batch 3 — state carries the
    chain across micro-batch boundaries for many pids at once."""
    import tempfile

    from syslog_ng_spark.streaming.stateful import patterndb_actions_stream

    rules = load_patterndb_rules(CHAIN_XML)
    schema = ("event_id long, ts timestamp, host string, program string, "
              "pid int, message string")

    def mk(rows, start_id=0):
        return [(start_id + i, T0 + dt.timedelta(seconds=s), h, p, pid, m)
                for i, (s, h, p, pid, m) in enumerate(rows)]

    batch1 = mk([(pid % 3, "h1", "p1", pid, "user login") for pid in range(8)])
    batch2 = mk([(40 + pid, "h1", "p1", pid, "suspicious activity")
                 for pid in range(8) if pid % 2 == 0], start_id=100)
    pusher = mk([(86400, "h1", "p1", 999, "user login")], start_id=200)

    with tempfile.TemporaryDirectory() as d:
        def run_once():
            stream = spark.readStream.schema(schema).parquet(d + "/in")
            q = (
                patterndb_actions_stream(
                    stream, rules, watermark="10 seconds",
                    order_tiebreak="event_id")
                .writeStream.format("parquet")
                .option("path", d + "/out")
                .option("checkpointLocation", d + "/ck")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        for phase in (batch1, batch2, pusher):
            spark.createDataFrame(phase, schema).coalesce(1).write.mode(
                "append").parquet(d + "/in")
            run_once()
        out = [r for r in spark.read.parquet(d + "/out").collect()
               if r.pid != 999]

    alerts = sorted(r.pid for r in out if r.rule_id == "21")
    assert alerts == [0, 2, 4, 6]
    assert all(r.message == "alert n=2 last=suspicious activity" for r in out
               if r.rule_id == "21")


# ---- r12: $(grep)/@N/$(context-length) on MATCH triggers --------------

GREP_MATCH_XML = """<patterndb version='5' pub_date='2010-02-22'>
 <ruleset name='grepmatch' id='11'>
  <rules>
    <rule provider='test' id='gm1' class='ctx' context-id='${PID}-gm'
          context-timeout='60' context-scope='program'>
     <patterns><pattern>gctx @ANYSTRING:what@</pattern></patterns>
     <actions>
       <action trigger='match'>
         <message inherit-properties='TRUE'>
           <values>
             <value name='MESSAGE'>n=$(context-length) hits=$(grep ('${what}' ne 'skip') ${what}) prev=${what}@1</value>
           </values>
         </message>
       </action>
     </actions>
    </rule>
  </rules>
 </ruleset>
</patterndb>"""

_GREP_MATCH_EXPECTED = [
    "n=1 hits=alpha prev=",
    "n=2 hits=alpha prev=alpha",
    "n=3 hits=alpha,gamma prev=skip",
]


def test_batch_grep_on_match_trigger(spark):
    """MATCH-trigger templates see the live per-message context view:
    each matching message's action renders against the context as of
    (and including) that message — $(context-length) counts earlier
    messages, $(grep) filters them, @1 is one back from the current."""
    rules = load_patterndb_rules(GREP_MATCH_XML)
    df = spark.createDataFrame(_grep_rows(), GREP_SCHEMA)
    out = sorted(
        patterndb_actions(df, rules, order_tiebreak="event_id").collect(),
        key=lambda r: r.ts,
    )
    assert [r.message for r in out] == _GREP_MATCH_EXPECTED
    assert all(r.trigger == "match" for r in out)


def test_stream_grep_on_match_trigger_parity(spark):
    """r12 (was a compile error in r11): streaming match-trigger
    $(grep)/@N routes through the stateful pool's per-message 'match'
    emission and renders exactly the batch messages."""
    import tempfile

    from syslog_ng_spark.streaming.stateful import patterndb_actions_stream

    rules = load_patterndb_rules(GREP_MATCH_XML)
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(_grep_rows(), GREP_SCHEMA).coalesce(1).write.mode(
            "append").parquet(d + "/in")
        stream = spark.readStream.schema(GREP_SCHEMA).parquet(d + "/in")
        q = (
            patterndb_actions_stream(
                stream, rules, watermark="10 seconds",
                order_tiebreak="event_id")
            .writeStream.format("parquet")
            .option("path", d + "/out")
            .option("checkpointLocation", d + "/ck")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = sorted(spark.read.parquet(d + "/out").collect(),
                     key=lambda r: r.ts)

    assert [r.message for r in out] == _GREP_MATCH_EXPECTED
    assert all(r.trigger == "match" for r in out)


def test_stream_match_context_across_micro_batches(spark):
    """The match view carries context state ACROSS micro-batches: a
    message in batch 2 sees batch 1's messages in its context."""
    import tempfile

    from syslog_ng_spark.streaming.stateful import patterndb_actions_stream

    rules = load_patterndb_rules(GREP_MATCH_XML)
    b1 = _grep_rows()[:2]
    b2 = _grep_rows()[2:]
    with tempfile.TemporaryDirectory() as d:
        def run_once():
            stream = spark.readStream.schema(GREP_SCHEMA).parquet(d + "/in")
            q = (
                patterndb_actions_stream(
                    stream, rules, watermark="10 seconds",
                    order_tiebreak="event_id")
                .writeStream.format("parquet")
                .option("path", d + "/out")
                .option("checkpointLocation", d + "/ck")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        for b in (b1, b2):
            spark.createDataFrame(b, GREP_SCHEMA).coalesce(1).write.mode(
                "append").parquet(d + "/in")
            run_once()
        out = sorted(spark.read.parquet(d + "/out").collect(),
                     key=lambda r: r.ts)

    assert [r.message for r in out] == _GREP_MATCH_EXPECTED


# ---- r13: live-context templates in CHAIN SEEDS (streaming) ----------
# Reference: _execute_action_create_context with triggering_context set
# renders seed values/context-id with log_template_format_with_context
# over the expiring context's messages (patterndb.c:326-336).

CHAIN_CTXREF_XML = """<patterndb version='5' pub_date='2010-02-22'>
 <ruleset name='ctxrefchain' id='4'>
  <rules>
    <rule provider='test' id='40' class='violation' context-scope='program'
          context-id='login-${PID}' context-timeout='10'>
     <patterns><pattern>user login</pattern></patterns>
     <actions>
       <action trigger='timeout' condition='"${MESSAGE}" eq "user login beta"'>
         <create-context context-id='watch-${PID}' context-timeout='100'
                         context-scope='program'>
           <message inherit-properties='last-message'>
             <values><value name='MESSAGE'>watch n=$(context-length) top=$(grep ('${MESSAGE}' ne 'user login skip') ${MESSAGE}) prev=${MESSAGE}@1</value></values>
           </message>
         </create-context>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='41' class='violation' context-scope='program'
          context-id='watch-${PID}' context-timeout='100'>
     <patterns><pattern>suspicious activity</pattern></patterns>
     <actions>
       <action trigger='timeout'>
         <message inherit-properties='last-message'>
           <values><value name='MESSAGE'>alert len=$(context-length) seed=${MESSAGE}@1</value></values>
         </message>
       </action>
     </actions>
    </rule>
  </rules>
 </ruleset>
</patterndb>"""

_CTXREF_CORPUS = [
    (0, "h1", "p1", 23, "user login alpha"),
    (3, "h1", "p1", 23, "user login skip"),
    (6, "h1", "p1", 23, "user login beta"),
    (50, "h1", "p1", 23, "suspicious activity"),
    # pid 7's login context's last message fails the chain condition:
    # no watch context, no alert
    (0, "h1", "p1", 7, "user login alpha"),
]

_CTXREF_ALERT = (
    "alert len=2 seed=watch n=3 "
    "top=user login alpha,user login beta prev=user login skip"
)


def test_batch_chain_seed_renders_against_triggering_context(spark):
    """Batch: the chain seed's $(context-length)/$(grep)/@N render
    over the EXPIRING context's rows; the seeded context's own expiry
    sees the rendered string as the seed's MESSAGE (via @1)."""
    rules = load_patterndb_rules(CHAIN_CTXREF_XML)
    out = patterndb_actions(
        _logs(spark, _CTXREF_CORPUS), rules, order_tiebreak="event_id"
    ).collect()
    assert [r.message for r in out] == [_CTXREF_ALERT]
    assert out[0].rule_id == "41" and out[0].trigger == "timeout"


def test_streaming_chain_ctxref_parity_with_batch(spark):
    """Streaming emits exactly the batch rows for the ctxref chained
    ruleset: the seed's live-context values are assembled in-state
    from the per-row helper columns (r13)."""
    import tempfile

    from syslog_ng_spark.streaming.stateful import patterndb_actions_stream

    rules = load_patterndb_rules(CHAIN_CTXREF_XML)
    schema = ("event_id long, ts timestamp, host string, program string, "
              "pid int, message string")
    batch_out = patterndb_actions(
        _logs(spark, _CTXREF_CORPUS), rules, order_tiebreak="event_id"
    ).collect()
    assert [r.message for r in batch_out] == [_CTXREF_ALERT]

    pusher = [(9000, T0 + dt.timedelta(seconds=86400), "h1", "p1", 999,
               "user login beta")]

    with tempfile.TemporaryDirectory() as d:
        def run_once():
            stream = spark.readStream.schema(schema).parquet(d + "/in")
            q = (
                patterndb_actions_stream(
                    stream, rules, watermark="10 seconds",
                    order_tiebreak="event_id")
                .select(*[c for c in batch_out[0].asDict()])
                .writeStream.format("parquet")
                .option("path", d + "/out")
                .option("checkpointLocation", d + "/ck")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        rows = [(i, T0 + dt.timedelta(seconds=s), h, p, pid, m)
                for i, (s, h, p, pid, m) in enumerate(_CTXREF_CORPUS)]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(d + "/in")
        run_once()
        spark.createDataFrame(pusher, schema).coalesce(1).write.mode(
            "append").parquet(d + "/in")
        run_once()
        stream_out = [r for r in spark.read.parquet(d + "/out").collect()
                      if r.pid != 999]

    def canon(rows):
        out = []
        for r in rows:
            d = r.asDict()
            d["synthetic_tags"] = tuple(d.get("synthetic_tags") or ())
            out.append(tuple(d[k] for k in sorted(d)))
        return sorted(out)

    assert canon(stream_out) == canon(batch_out)


def test_streaming_chain_ctxref_across_micro_batches_soak(spark):
    """Cross-batch soak for live-context chain seeds: logins arrive in
    batch 1, the seeds render at expiries processed in batch 2, the
    chained alerts flush in batch 3 — per-pid context lengths differ
    so each seed's $(context-length) proves it rendered against ITS
    context, carried across micro-batch boundaries."""
    import tempfile

    from syslog_ng_spark.streaming.stateful import patterndb_actions_stream

    rules = load_patterndb_rules(CHAIN_CTXREF_XML)
    schema = ("event_id long, ts timestamp, host string, program string, "
              "pid int, message string")

    def mk(rows, start_id=0):
        return [(start_id + i, T0 + dt.timedelta(seconds=s), h, p, pid, m)
                for i, (s, h, p, pid, m) in enumerate(rows)]

    # pid N's login context holds N+1 messages, last one 'beta'
    batch1 = []
    for pid in range(1, 5):
        for j in range(pid):
            batch1.append((j, "h1", "p1", pid, f"user login fill{j}"))
        batch1.append((pid, "h1", "p1", pid, "user login beta"))
    batch2 = [(40 + pid, "h1", "p1", pid, "suspicious activity")
              for pid in range(1, 5)]
    pusher = [(86400, "h1", "p1", 999, "user login beta")]

    with tempfile.TemporaryDirectory() as d:
        def run_once():
            stream = spark.readStream.schema(schema).parquet(d + "/in")
            q = (
                patterndb_actions_stream(
                    stream, rules, watermark="10 seconds",
                    order_tiebreak="event_id")
                .writeStream.format("parquet")
                .option("path", d + "/out")
                .option("checkpointLocation", d + "/ck")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        for i, phase in enumerate((mk(batch1), mk(batch2, 100),
                                   mk(pusher, 200))):
            spark.createDataFrame(phase, schema).coalesce(1).write.mode(
                "append").parquet(d + "/in")
            run_once()
        out = [r for r in spark.read.parquet(d + "/out").collect()
               if r.pid != 999]

    got = {r.pid: r.message for r in out if r.rule_id == "41"}
    assert sorted(got) == [1, 2, 3, 4]
    for pid, msg in got.items():
        assert msg.startswith(f"alert len=2 seed=watch n={pid + 1} ")


CHAIN_CTXID_XML = """<patterndb version='5' pub_date='2010-02-22'>
 <ruleset name='ctxidchain' id='5'>
  <rules>
    <rule provider='test' id='50' class='violation' context-scope='program'
          context-id='login-${PID}' context-timeout='10'>
     <patterns><pattern>user login</pattern></patterns>
     <actions>
       <action trigger='timeout' condition='"${MESSAGE}" eq "user login beta"'>
         <create-context context-id='watch-${PID}-n$(context-length)'
                         context-timeout='100' context-scope='program'>
           <message inherit-properties='last-message'>
             <values><value name='MESSAGE'>seen=$(context-values ${PID})</value></values>
           </message>
         </create-context>
       </action>
     </actions>
    </rule>
    <rule provider='test' id='51' class='violation' context-scope='program'
          context-id='watch-${PID}-n3' context-timeout='100'>
     <patterns><pattern>suspicious activity</pattern></patterns>
     <actions>
       <action trigger='timeout'>
         <message inherit-properties='last-message'>
           <values><value name='MESSAGE'>alert id=${CONTEXT_ID} seed=${MESSAGE}@1</value></values>
         </message>
       </action>
     </actions>
    </rule>
  </rules>
 </ruleset>
</patterndb>"""

_CTXID_CORPUS = [
    (0, "h1", "p1", 23, "user login one"),
    (3, "h1", "p1", 23, "user login two"),
    (6, "h1", "p1", 23, "user login beta"),
    (50, "h1", "p1", 23, "suspicious activity"),
]


def test_chain_context_id_with_live_context_refs_batch_and_stream(spark):
    """The chained context-ID template itself reads the live context
    ($(context-length), patterndb.c:326-328 renders the id template
    with the triggering context): pid 23's 3-login context seeds
    'watch-23-n3', which the joining rule's static id matches; the
    seed's $(context-values) renders every context row's PID."""
    import tempfile

    from syslog_ng_spark.streaming.stateful import patterndb_actions_stream

    rules = load_patterndb_rules(CHAIN_CTXID_XML)
    expected = "alert id=watch-23-n3 seed=seen=23,23,23"
    batch_out = patterndb_actions(
        _logs(spark, _CTXID_CORPUS), rules, order_tiebreak="event_id"
    ).collect()
    assert [r.message for r in batch_out] == [expected]

    schema = ("event_id long, ts timestamp, host string, program string, "
              "pid int, message string")
    pusher = [(9000, T0 + dt.timedelta(seconds=86400), "h1", "p1", 999,
               "user login beta")]
    with tempfile.TemporaryDirectory() as d:
        def run_once():
            stream = spark.readStream.schema(schema).parquet(d + "/in")
            q = (
                patterndb_actions_stream(
                    stream, rules, watermark="10 seconds",
                    order_tiebreak="event_id")
                .writeStream.format("parquet")
                .option("path", d + "/out")
                .option("checkpointLocation", d + "/ck")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        rows = [(i, T0 + dt.timedelta(seconds=s), h, p, pid, m)
                for i, (s, h, p, pid, m) in enumerate(_CTXID_CORPUS)]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(d + "/in")
        run_once()
        spark.createDataFrame(pusher, schema).coalesce(1).write.mode(
            "append").parquet(d + "/in")
        run_once()
        stream_out = [r for r in spark.read.parquet(d + "/out").collect()
                      if r.pid != 999]
    assert [r.message for r in stream_out if r.rule_id == "51"] == [expected]
