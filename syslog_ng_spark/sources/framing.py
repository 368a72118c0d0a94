"""RFC6587 syslog-over-TCP framing decoders.

Reference: lib/logproto/logproto-framed-server.c (octet-counted
framing: ASCII frame length, one space, then exactly that many bytes)
and logproto-text-server.c (non-transparent framing: newline
delimited); tests in lib/logproto/tests/test-framed-server.c. A
stream may MIX the two — each frame is classified by its first byte
(digit → octet-counted, else newline-framed), which is how the
reference's auto-detecting 'syslog' source behaves.

Frame splitting is inherently sequential WITHIN one connection's byte
stream, so the Spark shape is: one row per connection/file blob
(binaryFile / wholetext reads), frames exploded via mapInPandas —
parallelism across connections, exactly like the reference's
one-reader-per-connection model. The splitter is pure python because
length-prefixed iteration is not expressible as a Catalyst
expression; it runs Arrow-batched, never per-row py4j.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame


def split_frames(
    data: str | bytes,
    max_msg_size: int | None = None,
    trim_large_messages: bool = False,
) -> list[str]:
    """Split one connection's accumulated byte stream into messages.
    MSG-LEN counts OCTETS (RFC6587 §3.4.1), so all offsets operate on
    bytes — a str input is re-encoded first; slicing the decoded
    string would desynchronize every frame after a multi-byte UTF-8
    character. Octet-counted frames keep embedded newlines; between
    octet-counted frames a bare LF trailer is tolerated (some senders
    emit one); empty non-transparent lines are dropped. Frames decode
    utf-8 with replacement at the end.

    ``max_msg_size`` is log-msg-size(): an octet-counted frame larger
    than it is TRUNCATED to max_msg_size when trim_large_messages is
    set (logproto-framed-server.c:259-266, the rest of the frame is
    skipped) and otherwise a connection-fatal error — the reference
    closes the connection (framed-server.c:268-273), so the remainder
    of the stream is dropped here. Non-transparent lines follow the
    TEXT server instead, where trim does not apply: an over-long line
    yields the whole max-sized buffer as a message, i.e. it splits
    into max_msg_size chunks (logproto-text-server.c:356,384)."""
    buf = data.encode("utf-8") if isinstance(data, str) else bytes(data)
    out: list[bytes] = []
    i, n = 0, len(buf)
    while i < n:
        if 0x30 <= buf[i] <= 0x39:  # ascii digit
            j = i
            while j < n and 0x30 <= buf[j] <= 0x39:
                j += 1
            if j < n and buf[j] == 0x20:  # space
                length = int(buf[i:j])
                start = j + 1
                if max_msg_size is not None and length > max_msg_size:
                    if not trim_large_messages:
                        # connection closed mid-stream; rest is lost
                        break
                    out.append(buf[start : start + max_msg_size])
                else:
                    out.append(buf[start : start + length])
                i = start + length
                if i < n and buf[i : i + 1] == b"\n":  # optional trailer
                    i += 1
                continue
        j = buf.find(b"\n", i)
        if j < 0:
            seg = buf[i:]
            i = n
        else:
            seg = buf[i:j]
            i = j + 1
        if max_msg_size is not None:
            while len(seg) > max_msg_size:
                out.append(seg[:max_msg_size])
                seg = seg[max_msg_size:]
        if seg:
            out.append(seg)
    return [m.decode("utf-8", errors="replace") for m in out if m != b""]


def framed_messages(
    df: DataFrame, blob_col: str = "value", origin_col: str = "path",
    max_msg_size: int | None = None, trim_large_messages: bool = False,
) -> DataFrame:
    """Explode per-connection blobs into one row per decoded message:
    (origin, frame_no, message). Input shape: one row per connection
    capture / file (spark.read.text(..., wholetext=True) or
    binaryFile). max_msg_size/trim_large_messages = log-msg-size() /
    trim-large-messages(), see split_frames."""
    import pandas as pd

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for origin, blob in zip(pdf[origin_col], pdf[blob_col]):
                frames = split_frames(
                    blob, max_msg_size=max_msg_size,
                    trim_large_messages=trim_large_messages)
                for k, msg in enumerate(frames):
                    rows.append((origin, k, msg))
            yield pd.DataFrame(rows, columns=[origin_col, "frame_no", "message"])

    return df.select(origin_col, blob_col).mapInPandas(
        explode, schema=f"{origin_col} string, frame_no long, message string"
    )


def feed_line(
    line: bytes, pending: int, buf: bytes, out: list[bytes]
) -> tuple[int, bytes]:
    """Feed ONE newline-terminated line (terminator stripped, as a
    line reader delivers it) into the mixed-mode RFC6587 decoder.

    Key invariant making line-at-a-time decode exact: an octet-count
    HEADER (digits + space) contains no newline, so it never spans
    lines — only frame PAYLOAD does, via embedded newlines, and each
    eaten line terminator counts one octet toward MSG-LEN. `pending` =
    payload bytes still owed to the current frame, `buf` = its
    accumulated payload; completed frames append to `out`."""
    import re

    b = line
    while True:
        if pending > 0:
            take = min(pending, len(b))
            buf += b[:take]
            pending -= take
            b = b[take:]
            if pending > 0:  # line exhausted: the '\n' counts
                buf += b"\n"
                pending -= 1
                if pending == 0:
                    out.append(buf)
                    buf = b""
                return pending, buf
            out.append(buf)
            buf = b""
            if not b:
                return 0, b""
            continue
        m = re.match(rb"([0-9]+) ", b)
        if m:
            length = int(m.group(1))
            rest = b[m.end() :]
            if length <= len(rest):
                out.append(rest[:length])
                b = rest[length:]
                if not b:
                    return 0, b""
                continue
            # payload continues on later lines; the eaten '\n' is
            # payload byte number len(rest)+1
            still = length - len(rest) - 1
            buf = rest + b"\n"
            if still == 0:
                out.append(buf)
                buf = b""
            return still, buf
        if b:  # newline-framed message (digits without a space too)
            out.append(b)
        return 0, b""


def framed_lines_stream(
    df: DataFrame, line_col: str = "raw", conn_col: str | None = None
) -> DataFrame:
    """Stateful RFC6587 decode over a LINE stream (the socket text
    source): per-connection state carries the partial octet-counted
    frame across micro-batches, so frames with embedded newlines —
    which the line reader spreads over rows and batches — reassemble
    exactly. This is the reference's per-connection framing state
    (lib/logproto/logproto-framed-server.c) keyed and shuffled like
    any stateful op, so it scales per connection. Caveat from the
    line-reader transport (not the decoder): a stripped CR is not
    restored, so CRLF senders' byte counts shift.

    Output: (conn, frame_no, message) — frame_no is per-connection
    and monotonic across batches."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = df
    if conn_col is None:
        conn_col = "_conn"
        src = df.withColumn(conn_col, F.lit("0"))

    out_schema = f"conn string, frame_no long, message string"
    state_schema = "pending long, buf binary, counter long"

    def fn(key_tuple, pdfs, state: GroupState):
        (conn,) = key_tuple
        if state.hasTimedOut:  # pragma: no cover - no timeout set
            state.remove()
            return
        pending, buf, counter = state.get if state.exists else (0, b"", 0)
        buf = bytes(buf or b"")
        frames: list[bytes] = []
        for pdf in pdfs:
            for line in pdf[line_col]:
                pending, buf = feed_line(
                    str(line).encode("utf-8"), pending, buf, frames
                )
        rows = [
            (conn, counter + k, m.decode("utf-8", errors="replace"))
            for k, m in enumerate(frames)
            if m != b""
        ]
        counter += len(frames)
        state.update((pending, buf, counter))
        if rows:
            yield pd.DataFrame(rows, columns=["conn", "frame_no", "message"])

    return (
        src.select(conn_col, line_col)
        .groupBy(conn_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def split_records(
    data: bytes | str, record_size: int, padded: bool = True
) -> list[str]:
    """Fixed-size record framing (lib/logproto/logproto-record-server.c,
    the file()/pipe() pad-size() option). The stream is consumed in
    exactly `record_size`-byte chunks; in padded mode each record's
    message ends at the first '\\n' OR NUL byte (find_eom,
    logproto-server.c:45) — the rest is padding — while binary mode
    (padded=False) keeps every record verbatim. Empty messages ARE
    emitted (a record starting with NUL fetches "" in the reference's
    criterion suite). A short trailing chunk is a hard error exactly
    like log_proto_record_server_read_data's EIO ("Record size was
    set, and couldn't read enough bytes") — a torn record means the
    producer and consumer disagree on the record size, silently
    re-syncing would corrupt every later record. Encoding conversions
    (the ucs-4 criterion variants) are out of scope: the line model
    here is utf-8 (bytes decode with replacement)."""
    buf = data.encode("utf-8") if isinstance(data, str) else bytes(data)
    out: list[str] = []
    for i in range(0, len(buf), record_size):
        rec = buf[i:i + record_size]
        if len(rec) != record_size:
            raise ValueError(
                "Record size was set, and couldn't read enough bytes: "
                f"record_size={record_size} read={len(rec)}"
            )
        if padded:
            nl = rec.find(b"\n")
            nul = rec.find(b"\x00")
            ends = [e for e in (nl, nul) if e >= 0]
            if ends:
                rec = rec[:min(ends)]
        out.append(rec.decode("utf-8", errors="replace"))
    return out


def record_messages(
    df: DataFrame,
    record_size: int,
    padded: bool = True,
    blob_col: str = "content",
    origin_col: str = "path",
) -> DataFrame:
    """Explode fixed-size-record blobs (spark.read.format('binaryFile'))
    into one row per record: (origin, record_no, raw). Parallelism
    across files, like the reference's one-reader-per-fd model; the
    per-file splitter is sequential by construction (records are
    positional)."""
    import pandas as pd

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for origin, blob in zip(pdf[origin_col], pdf[blob_col]):
                for k, msg in enumerate(
                    split_records(bytes(blob), record_size, padded)
                ):
                    rows.append((origin, k, msg))
            yield pd.DataFrame(rows, columns=[origin_col, "record_no", "raw"])

    return df.select(origin_col, blob_col).mapInPandas(
        explode, schema=f"{origin_col} string, record_no long, raw string"
    )
