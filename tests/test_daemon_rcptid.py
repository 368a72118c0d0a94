"""use-uniqid(yes) in daemon mode (r12): $RCPTID is assigned at
reception per micro-batch, BEFORE the step chain (filtered messages
consume ids, lib/rcptid.c), gapless across micro-batches, and the
next id persists beside the checkpoint so a daemon restart continues
the counter (rcptid persist-state)."""
from __future__ import annotations

import json
import os

from syslog_ng_spark.config import run_conf_stream


def _conf(indir, outdir):
    return f"""
options {{ use-uniqid(yes); }};
source s {{ file("{indir}" flags(no-parse)); }};
filter f {{ message("keep"); }};
destination d {{ file("{outdir}" template("$RCPTID $MSG")); }};
log {{ source(s); filter(f); destination(d); }};
"""


def _land(indir, name, lines):
    with open(os.path.join(indir, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def _drain(spark, text, ckpt):
    queries = run_conf_stream(spark, text, str(ckpt), available_now=True)
    for q in queries:
        q.awaitTermination(180)


def _read_out(spark, outdir):
    rows = [r["value"].split(" ", 1) for r in spark.read.text(str(outdir)).collect()]
    return {msg: int(rid) for rid, msg in rows}


def test_daemon_rcptid_gapless_across_batches_and_restart(spark, tmp_path):
    indir, outdir, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
    os.makedirs(indir)
    text = _conf(indir, outdir)

    # batch 1: three kept messages -> ids 1..3
    _land(indir, "b1.log", ["keep a1", "keep a2", "keep a3"])
    _drain(spark, text, ckpt)
    out = _read_out(spark, outdir)
    assert sorted(out[m] for m in ("keep a1", "keep a2", "keep a3")) == [1, 2, 3]

    # batch 2: two kept + two FILTERED — the dropped messages still
    # consume reception ids, so the kept ones land inside 4..7
    _land(indir, "b2.log", ["keep b1", "drop x", "keep b2", "drop y"])
    _drain(spark, text, ckpt)
    out = _read_out(spark, outdir)
    b2 = {out["keep b1"], out["keep b2"]}
    assert b2 <= {4, 5, 6, 7} and len(b2) == 2

    # batch 3: one message -> id exactly 8 (proves batch 2 consumed
    # FOUR ids, not two)
    _land(indir, "b3.log", ["keep c1"])
    _drain(spark, text, ckpt)
    out = _read_out(spark, outdir)
    assert out["keep c1"] == 8

    # the persisted counter is on disk next to the checkpoint
    state_files = [p for p in os.listdir(ckpt) if p.endswith("_rcptid.json")]
    assert len(state_files) == 1
    st = json.load(open(os.path.join(ckpt, state_files[0])))
    assert st["next"] == 9

    # daemon RESTART: a fresh run_conf_stream over the same checkpoint
    # continues from the persisted next id
    _land(indir, "b4.log", ["keep d1", "keep d2"])
    _drain(spark, text, ckpt)
    out = _read_out(spark, outdir)
    assert sorted((out["keep d1"], out["keep d2"])) == [9, 10]

    # every id unique, none reused
    assert len(set(out.values())) == len(out)


def test_daemon_uniqid_renders_from_persistent_rcptid(spark, tmp_path):
    indir, outdir, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ck"
    os.makedirs(indir)
    text = f"""
options {{ use-uniqid(yes); }};
source s {{ file("{indir}" flags(no-parse)); }};
destination d {{ file("{outdir}" template("$UNIQID $MSG")); }};
log {{ source(s); destination(d); }};
"""
    _land(indir, "b1.log", ["first"])
    _drain(spark, text, ckpt)
    _land(indir, "b2.log", ["second"])
    _drain(spark, text, ckpt)
    rows = {r["value"].split(" ", 1)[1]: r["value"].split(" ", 1)[0]
            for r in spark.read.text(str(outdir)).collect()}
    # M_UNIQID: HOSTID '@' rcptid as 16-wide hex — rcptid 1 then 2
    assert rows["first"].endswith("@0000000000000001")
    assert rows["second"].endswith("@0000000000000002")
