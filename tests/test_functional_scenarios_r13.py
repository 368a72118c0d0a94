"""Reference functional-suite scenarios ported round 13
(tests/python_functional/functional_tests):

- template_functions/graphite-output/test_graphite_output.py
- rewrites/set-tag/test_set_tag.py (condition-gated set-tag)
- source_drivers/file_source/test_follow_freq_value.py
- config_change/test_manipulating_config_between_reload.py (daemon
  analog: changed configs resumed over the same checkpoint root)
"""

from __future__ import annotations

import time

import pytest

from syslog_ng_spark.config import compile_conf, run_conf, run_conf_stream
from syslog_ng_spark.conflang import ConfError


def _lines(path):
    return sorted(
        ln for f in path.glob("part-*") for ln in f.read_text().splitlines()
    )


def test_graphite_output(spark, tmp_path):
    """test_graphite_output.py: one generated message carrying
    test.key1/test.key2 NV pairs renders one 'key value timestamp'
    line per --key match through the full conf pipeline."""
    out = tmp_path / "out"
    run_conf(spark, f"""
source s {{ example-msg-generator(num(1)
            values("test.key1" => "value1" "test.key2" => "value2")); }};
destination d {{ file("{out}"
  template("$(graphite-output --timestamp 'custom_timestamp' --key test.*)")); }};
log {{ source(s); destination(d); }};
""")
    # the fn emits one '\n'-terminated line per pair; the reference
    # test reads exactly two lines (read_logs(2)), ignoring the
    # template's own trailing newline
    assert [ln for ln in _lines(out) if ln] == [
        "test.key1 value1 custom_timestamp",
        "test.key2 value2 custom_timestamp",
    ]


def test_set_tag_with_condition(spark, tmp_path):
    """test_set_tag.py: set-tag() under condition(match(...)) only
    tags when the filter matches the generated message."""
    out = tmp_path / "out"
    run_conf(spark, f"""
source s {{ example-msg-generator(num(1)
            template("input with MATCHSTRING in it")); }};
rewrite r {{
  set-tag("SHOULDMATCH" condition(match("MATCHSTRING" value("MSG"))));
  set-tag("DONOTMATCH" condition(match("NONE" value("MSG"))));
}};
destination d {{ file("{out}" template("$TAGS\\n")); }};
log {{ source(s); rewrite(r); destination(d); }};
""")
    lines = _lines(out)
    assert len(lines) == 1
    assert "SHOULDMATCH" in lines[0]
    assert "DONOTMATCH" not in lines[0]


@pytest.mark.parametrize("value", ["1", "1.0", "0.1", "0", "0.0"])
def test_follow_freq_nonnegative_accepted(value):
    specs = compile_conf(f"""
source s {{ file("/tmp/in.log" follow-freq({value})); }};
destination d {{ file("/tmp/out"); }};
log {{ source(s); destination(d); }};
""")
    assert specs[0]["source"]["follow_freq"] == float(value)


@pytest.mark.parametrize("value", ["-1", "-1.0", "-0.1"])
def test_follow_freq_negative_rejected(value):
    """The reference grammar only accepts nonnegative floats
    (affile-grammar.ym:178); a negative follow-freq fails startup."""
    with pytest.raises(ConfError, match="nonnegative"):
        compile_conf(f"""
source s {{ file("/tmp/in.log" follow-freq({value})); }};
destination d {{ file("/tmp/out"); }};
log {{ source(s); destination(d); }};
""")


def test_config_change_between_reloads(spark, tmp_path):
    """test_manipulating_config_between_reload.py, daemon analog:
    phase 1 runs src1 -> out1; the 'reload' adds a second destination
    on the same path plus a second source in its own path (the
    reference adds the source group to the same path — Spark
    checkpoints pin a path's source set, so the new source gets its
    own path, same routing result); the final reload removes both
    again. Every phase resumes over the same checkpoint root and the
    rows land exactly where the active config routes them."""
    src1 = tmp_path / "watch1"
    src2 = tmp_path / "watch2"
    src1.mkdir()
    src2.mkdir()
    out1 = tmp_path / "out1"
    out2 = tmp_path / "out2"
    ckpt = tmp_path / "ckpt"

    def drain(text):
        queries = run_conf_stream(spark, text, str(ckpt), available_now=True)
        for q in queries:
            q.awaitTermination(60)

    conf_v1 = f"""
source s1 {{ file("{src1}/*.log" flags(no-parse)); }};
destination d1 {{ file("{out1}" template("$MESSAGE\\n")); }};
log {{ source(s1); destination(d1); }};
"""
    conf_v2 = f"""
source s1 {{ file("{src1}/*.log" flags(no-parse)); }};
source s2 {{ file("{src2}/*.log" flags(no-parse)); }};
destination d1 {{ file("{out1}" template("$MESSAGE\\n")); }};
destination d2 {{ file("{out2}" template("$MESSAGE\\n")); }};
log {{ source(s1); destination(d1); destination(d2); }};
log {{ source(s2); destination(d1); destination(d2); }};
"""

    (src1 / "a.log").write_text("phase1-msg\n")
    drain(conf_v1)
    assert _lines(out1) == ["phase1-msg"]

    # reload with the extended config: new rows from BOTH sources
    # reach BOTH destinations; phase-1 rows are not re-delivered
    (src1 / "b.log").write_text("phase2-from-src1\n")
    (src2 / "c.log").write_text("phase2-from-src2\n")
    drain(conf_v2)
    assert _lines(out1) == ["phase1-msg", "phase2-from-src1",
                            "phase2-from-src2"]
    assert _lines(out2) == ["phase2-from-src1", "phase2-from-src2"]

    # reload back to the original: src2 and d2 are detached
    (src1 / "d.log").write_text("phase3-from-src1\n")
    (src2 / "e.log").write_text("phase3-from-src2-ignored\n")
    drain(conf_v1)
    assert _lines(out1) == ["phase1-msg", "phase2-from-src1",
                            "phase2-from-src2", "phase3-from-src1"]
    assert _lines(out2) == ["phase2-from-src1", "phase2-from-src2"]
