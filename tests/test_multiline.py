"""Multi-line reassembly tests.

Shapes modeled on the reference's logproto multiline tests
(lib/logproto/tests/test-indented-multiline-server.c,
test-regexp-multiline.c): indented continuations, prefix-started
messages, suffix-terminated messages, plus the streaming tail held
across micro-batches.
"""

from __future__ import annotations

import tempfile

from syslog_ng_spark.operators.multiline import (
    reassemble_multiline,
    reassemble_multiline_stream,
)

TRACE = [
    (1, "Exception in thread main java.lang.NullPointerException"),
    (2, "    at com.example.Foo.bar(Foo.java:13)"),
    (3, "    at com.example.Main.main(Main.java:4)"),
    (4, "plain single-line message"),
    (5, "2024-01-01 another message"),
    (6, "\tcontinued with a tab"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "line_no long, raw string")


def test_indented_reassembly(spark):
    out = {
        r.first_line_no: r
        for r in reassemble_multiline(_df(spark, TRACE), "raw", "line_no").collect()
    }
    assert len(out) == 3
    assert out[1].n_lines == 3 and out[1].message.count("\n") == 2
    assert out[4].message == "plain single-line message"
    assert out[5].n_lines == 2 and out[5].message.endswith("continued with a tab")


def test_prefix_mode(spark):
    rows = [
        (1, "2024-01-01 first"),
        (2, "continuation without indent"),
        (3, "2024-01-02 second"),
    ]
    out = reassemble_multiline(
        _df(spark, rows), "raw", "line_no", mode="prefix", prefix=r"^\d{4}-\d{2}-\d{2} "
    ).collect()
    msgs = sorted(r.message for r in out)
    assert msgs == [
        "2024-01-01 first\ncontinuation without indent",
        "2024-01-02 second",
    ]


def test_prefix_suffix_mode(spark):
    rows = [
        (1, "BEGIN alpha"),
        (2, "body END"),
        (3, "stray line"),  # follows a suffix -> starts a new message
        (4, "BEGIN beta"),
    ]
    out = reassemble_multiline(
        _df(spark, rows),
        "raw",
        "line_no",
        mode="prefix",
        prefix=r"^BEGIN ",
        suffix=r" END$",
    ).collect()
    msgs = sorted(r.message for r in out)
    assert msgs == ["BEGIN alpha\nbody END", "BEGIN beta", "stray line"]


def test_groups_are_independent(spark):
    rows = [
        ("a", 1, "start a"),
        ("b", 1, "start b"),
        ("a", 2, "  cont a"),
        ("b", 2, "start b2"),
    ]
    df = spark.createDataFrame(rows, "src string, line_no long, raw string")
    out = reassemble_multiline(df, "raw", "line_no", group_col="src").collect()
    got = {(r.src, r.message) for r in out}
    assert got == {("a", "start a\n  cont a"), ("b", "start b"), ("b", "start b2")}


def test_streaming_tail_held_across_batches(spark):
    schema = "path string, line_no long, raw string"
    phase1 = [
        ("f1", 1, "Exception: boom"),
        ("f1", 2, "    at frame one"),
    ]
    # batch 2: the continuation arrives, then a NEW start flushes the tail
    phase2 = [
        ("f1", 3, "    at frame two"),
        ("f1", 4, "next message"),
    ]
    with tempfile.TemporaryDirectory() as d:
        for rows in (phase1, phase2):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
                d + "/in"
            )
            q = (
                reassemble_multiline_stream(
                    spark.readStream.schema(schema).parquet(d + "/in")
                )
                .writeStream.format("parquet")
                .option("path", d + "/out")
                .option("checkpointLocation", d + "/ck")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
        rows = spark.read.parquet(d + "/out").collect()
    # only the completed message is emitted; 'next message' stays open
    assert len(rows) == 1
    assert rows[0].message == "Exception: boom\n    at frame one\n    at frame two"
    assert rows[0].n_lines == 3


def test_streaming_flush_timeout_emits_tail(spark):
    """flush-timeout(): a pending tail with no new lines is emitted
    once the processing-time timeout fires (second availableNow run
    with no new data for the key)."""
    import time

    schema = "path string, line_no long, raw string"
    # state-store maintenance threads may still be writing when the
    # context manager cleans up; don't fail the test on that race
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as d:
        spark.createDataFrame(
            [("f1", 1, "Exception: boom"), ("f1", 2, "    at frame one")], schema
        ).coalesce(1).write.mode("append").parquet(d + "/in")

        def run():
            q = (
                reassemble_multiline_stream(
                    spark.readStream.schema(schema).parquet(d + "/in"),
                    flush_timeout_s=1,
                )
                .writeStream.format("parquet")
                .option("path", d + "/out")
                .option("checkpointLocation", d + "/ck")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run()
        time.sleep(2)  # let the processing-time timeout elapse
        # new data for ANOTHER key advances the batch clock; f1 times out
        spark.createDataFrame([("f2", 1, "x")], schema).coalesce(1).write.mode(
            "append"
        ).parquet(d + "/in")
        run()
        rows = spark.read.parquet(d + "/out").collect()
    by_path = {r.path: r for r in rows}
    assert by_path["f1"].message == "Exception: boom\n    at frame one"
    assert by_path["f1"].n_lines == 2


def test_mbox_source_from_separator(spark):
    from syslog_ng_spark.sources.files import mbox_messages

    lines = [
        "From alice@example.com Thu Jan  5 03:04:05 2024",
        "Subject: hello",
        "",
        "first body",
        "From bob@example.com Thu Jan  5 04:00:00 2024",
        "Subject: re: hello",
        "",
        "second body",
        "with two lines",
    ]
    df = spark.createDataFrame(
        [(i, line) for i, line in enumerate(lines)], "line_no long, raw string"
    )
    msgs = {r.msg_id: r for r in mbox_messages(df).collect()}
    assert len(msgs) == 2
    assert msgs[1].message.startswith("From alice@example.com")
    assert "first body" in msgs[1].message and msgs[1].n_lines == 4
    assert msgs[2].message.endswith("with two lines") and msgs[2].n_lines == 5
