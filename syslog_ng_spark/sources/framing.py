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


def split_frames(data: str) -> list[str]:
    """Split one connection's accumulated byte stream (as str) into
    messages. Octet-counted frames keep embedded newlines; between
    octet-counted frames a bare LF trailer is tolerated (some senders
    emit one); empty non-transparent lines are dropped."""
    out: list[str] = []
    i, n = 0, len(data)
    while i < n:
        ch = data[i]
        if ch.isdigit():
            j = i
            while j < n and data[j].isdigit():
                j += 1
            if j < n and data[j] == " ":
                length = int(data[i:j])
                start = j + 1
                out.append(data[start : start + length])
                i = start + length
                if i < n and data[i] == "\n":  # optional trailer
                    i += 1
                continue
        j = data.find("\n", i)
        if j < 0:
            if i < n:
                out.append(data[i:])
            break
        if j > i:
            out.append(data[i:j])
        i = j + 1
    return [m for m in out if m != ""]


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
                if isinstance(blob, (bytes, bytearray)):
                    blob = blob.decode("utf-8", errors="replace")
                for k, msg in enumerate(split_frames(blob)):
                    rows.append((origin, k, msg))
            yield pd.DataFrame(rows, columns=[origin_col, "frame_no", "message"])

    return df.select(origin_col, blob_col).mapInPandas(
        explode, schema=f"{origin_col} string, frame_no long, message string"
    )
