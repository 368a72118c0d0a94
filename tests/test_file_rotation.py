"""Daemon-mode file-source rotation semantics (r11 checklist item).

Reference: modules/affile/file-reader.c follows a rotated file —
same-name recreate is detected by inode change and the reader reopens
at offset 0, so `logrotate` with `create` mode loses nothing.

Spark's FileStreamSource has no inode concept: it tracks SEEN files by
PATH in the checkpointed file log (`FileStreamSource.seenFiles`), so a
same-name recreate is "already processed" and its NEW content is
silently skipped. The supported rotation recipe is therefore
move-out-of-glob + write NEW names (logrotate `dateext`, or any
writer that rolls to timestamped files): every live file is a new
path, the rotated file leaves the glob, and the checkpointed log
gives exactly-once per path. These tests pin BOTH behaviors so the
divergence is documented by executable fact, not prose alone.
"""
from __future__ import annotations

import os


def _drain(spark, watch_glob, out, ck):
    from syslog_ng_spark.sources.streaming import file_stream

    q = (
        file_stream(spark, watch_glob)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(r.raw for r in spark.read.parquet(out).collect())


def test_dateext_rotation_zero_loss_zero_dup(spark, tmp_path):
    """The supported recipe: rotate by ROLLING TO NEW NAMES. Three
    micro-batch drains across two rolls: every line exactly once."""
    src = tmp_path / "logs"
    src.mkdir()
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    glob = str(src / "*.log")

    (src / "app-20240101.log").write_text("l1\nl2\n")
    assert _drain(spark, glob, out, ck) == ["l1", "l2"]

    # roll: previous file moves OUT of the glob, writer opens a new name
    os.rename(src / "app-20240101.log", src / "app-20240101.log.rotated")
    (src / "app-20240102.log").write_text("l3\nl4\n")
    assert _drain(spark, glob, out, ck) == ["l1", "l2", "l3", "l4"]

    # roll again + a third drain with nothing new: still no dup
    os.rename(src / "app-20240102.log", src / "app-20240102.log.rotated")
    (src / "app-20240103.log").write_text("l5\n")
    assert _drain(spark, glob, out, ck) == ["l1", "l2", "l3", "l4", "l5"]
    assert _drain(spark, glob, out, ck) == ["l1", "l2", "l3", "l4", "l5"]


def test_same_name_recreate_is_skipped_documented(spark, tmp_path):
    """The DIVERGENCE, pinned: a same-path recreate (logrotate
    `create` mode) is invisible to FileStreamSource's path-keyed seen
    log — its content is skipped, where the reference's inode check
    would reopen. If this test ever fails with the recreated content
    PRESENT, Spark changed semantics and the recipe docs must be
    revisited."""
    src = tmp_path / "logs"
    src.mkdir()
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    glob = str(src / "*.log")

    (src / "app.log").write_text("a1\n")
    assert _drain(spark, glob, out, ck) == ["a1"]

    # same-name recreate with new content
    os.remove(src / "app.log")
    (src / "app.log").write_text("a2\n")
    got = _drain(spark, glob, out, ck)
    assert got == ["a1"], (
        "same-path recreate was unexpectedly re-read; update the "
        "rotation recipe documentation"
    )
