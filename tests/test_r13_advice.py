"""Round-13 ADVICE regression pins: msg-generator freq() plumbing
(+ sub-1Hz periods), values() trailing-pair ConfError, numbering-
cache releases, chain convergence at the exact depth cap, and the
create-context timeout arming mode."""

from __future__ import annotations

import datetime as dt

import pytest

from syslog_ng_spark.config import compile_conf, run_pipeline
from syslog_ng_spark.conflang import ConfError
from syslog_ng_spark.operators.actions import (
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
        "event_id long, ts timestamp, host string, program string, "
        "pid int, message string",
    )


# ---------------------------------------------------------------------------
# example-msg-generator freq() (ADVICE r12 medium)
# ---------------------------------------------------------------------------


def _gen_spec(opts: str) -> dict:
    return compile_conf(f"""
source s {{ example-msg-generator({opts}); }};
destination d {{ file("/tmp/out"); }};
log {{ source(s); destination(d); }};
""")[0]["source"]


def test_msg_generator_freq_compiled_into_spec():
    """freq(N) = N seconds between messages (msg-generator-source-
    options.h:64 stores freq*1000 ms); the conf front-end must carry
    it to the spec config._source_stream reads."""
    assert _gen_spec("num(3) freq(0.1)")["freq"] == 0.1
    assert _gen_spec("num(3) freq(10)")["freq"] == 10.0
    assert "freq" not in _gen_spec("num(3)")  # default 1 s stays implicit


def test_msg_generator_sub_hz_stream_builds(spark):
    """freq > 1 s (slower than 1 msg/s) can't be a rowsPerSecond —
    the stream keeps every round(freq)-th 1 Hz tick instead. The
    frame must build (lazy) with the same schema as the fast path."""
    from syslog_ng_spark.config import _source_stream

    slow = _source_stream(
        spark, {"kind": "msg-generator", "num": 2, "freq": 10,
                "values": {}, "template": "tick ${event_id}"})
    fast = _source_stream(
        spark, {"kind": "msg-generator", "num": 2, "freq": 0.5,
                "values": {}, "template": "tick ${event_id}"})
    assert slow.isStreaming and fast.isStreaming
    assert slow.schema == fast.schema


def test_values_trailing_incomplete_pair_raises():
    with pytest.raises(ConfError, match="incomplete"):
        compile_conf("""
source s { example-msg-generator(values("A" => "x" "B" =>)); };
destination d { file("/tmp/out"); };
log { source(s); destination(d); };
""")


def test_values_single_stray_token_raises():
    with pytest.raises(ConfError, match="incomplete"):
        compile_conf("""
source s { example-msg-generator(values("A" => "x" "STRAY")); };
destination d { file("/tmp/out"); };
log { source(s); destination(d); };
""")


def test_values_complete_pairs_still_parse():
    spec = _gen_spec('values("A" => "x" "B" => "y")')
    assert spec["values"] == {"A": "x", "B": "y"}


# ---------------------------------------------------------------------------
# numbering-cache release (ADVICE r12 low)
# ---------------------------------------------------------------------------


def test_batch_rcptid_cache_released_after_run(spark, tmp_path):
    """Batch-mode use-uniqid(yes) pins the numbering layout with a
    persisted frame; run_pipeline must unpersist it once every
    destination has materialized."""
    src = tmp_path / "in.log"
    src.write_text("a\nb\nc\n")
    out = run_pipeline(spark, {
        "source": {"kind": "file", "path": str(src),
                   "message_from_raw": True},
        "use_rcptid": True,
        "destination": {"kind": "text", "path": str(tmp_path / "out"),
                        "template": "$RCPTID $MESSAGE\n"},
    })
    rcpt = getattr(out, "_rcptid_frame", None)
    assert rcpt is not None
    cache = getattr(rcpt, "_seqnum_cache", None)
    assert cache is not None
    lvl = cache.storageLevel
    assert not lvl.useMemory and not lvl.useDisk  # released


# ---------------------------------------------------------------------------
# chain convergence check at the exact depth cap (ADVICE r12 low)
# ---------------------------------------------------------------------------

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


def test_chain_terminating_exactly_at_cap_does_not_raise(spark):
    """A chain of depth exactly max_chain_depth whose action
    condition goes FALSE on the final generation is converged — the
    non-convergence check must evaluate the condition (the would-be
    seeds), not just context existence at the cap."""
    rules = load_patterndb_rules(CHAIN_STOP_XML)
    df = _logs(spark, [(0, "h1", "p1", 5, "boot")])
    # depth cap 1: generation 0 (the boot context) seeds generation 1
    # (the b2 context); b2's seed message is 'stage2', the condition
    # fails there, the chain is done — no spurious raise
    out = patterndb_actions(
        df, rules, order_tiebreak="event_id", max_chain_depth=1
    ).collect()
    assert out == []


def test_self_chaining_still_raises_at_cap(spark):
    xml = CHAIN_STOP_XML.replace("b2-${PID}", "b-${PID}").replace(
        " condition='\"${MESSAGE}\" eq \"boot\"'", "")
    rules = load_patterndb_rules(xml)
    df = _logs(spark, [(0, "h1", "p1", 5, "boot")])
    with pytest.raises(RuntimeError, match="did not converge"):
        patterndb_actions(
            df, rules, order_tiebreak="event_id", max_chain_depth=2
        ).collect()


# ---------------------------------------------------------------------------
# create-context timeout arming mode (ADVICE r12 low)
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


def test_create_context_timeout_mode_rule_vs_declared(spark):
    """patterndb.c:351 arms the new context's timer with
    rule->context.timeout (10 here) even though the XML declares
    context-timeout=100 on the create-context (and the reference's
    own debug log prints the declared one). mode='declared' (default)
    follows the XML: the t=50 joiner is within 100 s of the t=10 seed
    -> one chained alert counting both. mode='rule' reproduces the
    reference's arming: gap 40 > 10, the seed expired alone, the
    joiner starts a fresh context -> alert counts only itself."""
    rules = load_patterndb_rules(CHAIN_XML)
    df = _logs(spark, [
        (0, "h1", "p1", 23, "user login"),
        (50, "h1", "p1", 23, "suspicious activity"),
    ])
    declared = patterndb_actions(
        df, rules, order_tiebreak="event_id").collect()
    assert [r.message for r in declared] == [
        "alert n=2 last=suspicious activity"]

    ref_armed = patterndb_actions(
        df, rules, order_tiebreak="event_id",
        create_context_timeout_mode="rule").collect()
    alerts = sorted(r.message for r in ref_armed if r.rule_id == "21")
    assert alerts == ["alert n=1 last=suspicious activity"]


def test_create_context_timeout_mode_validated(spark):
    rules = load_patterndb_rules(CHAIN_XML)
    df = _logs(spark, [(0, "h1", "p1", 23, "user login")])
    with pytest.raises(ValueError, match="declared"):
        patterndb_actions(df, rules, create_context_timeout_mode="bogus")
