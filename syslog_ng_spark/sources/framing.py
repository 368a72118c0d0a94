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


def split_frames(data: str | bytes) -> list[str]:
    """Split one connection's accumulated byte stream into messages.
    MSG-LEN counts OCTETS (RFC6587 §3.4.1), so all offsets operate on
    bytes — a str input is re-encoded first; slicing the decoded
    string would desynchronize every frame after a multi-byte UTF-8
    character. Octet-counted frames keep embedded newlines; between
    octet-counted frames a bare LF trailer is tolerated (some senders
    emit one); empty non-transparent lines are dropped. Frames decode
    utf-8 with replacement at the end."""
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
                out.append(buf[start : start + length])
                i = start + length
                if i < n and buf[i : i + 1] == b"\n":  # optional trailer
                    i += 1
                continue
        j = buf.find(b"\n", i)
        if j < 0:
            if i < n:
                out.append(buf[i:])
            break
        if j > i:
            out.append(buf[i:j])
        i = j + 1
    return [m.decode("utf-8", errors="replace") for m in out if m != b""]


def framed_messages(
    df: DataFrame, blob_col: str = "value", origin_col: str = "path"
) -> DataFrame:
    """Explode per-connection blobs into one row per decoded message:
    (origin, frame_no, message). Input shape: one row per connection
    capture / file (spark.read.text(..., wholetext=True) or
    binaryFile)."""
    import pandas as pd

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for origin, blob in zip(pdf[origin_col], pdf[blob_col]):
                for k, msg in enumerate(split_frames(blob)):
                    rows.append((origin, k, msg))
            yield pd.DataFrame(rows, columns=[origin_col, "frame_no", "message"])

    return df.select(origin_col, blob_col).mapInPandas(
        explode, schema=f"{origin_col} string, frame_no long, message string"
    )
