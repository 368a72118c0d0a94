"""Addendum 13 measurement: binary journal decode throughput.

MB/s/core for the pure-Python object walk (sources/journal_binary.py)
across the journald compression eras — regular uncompressed, XZ
(stdlib lzma), LZ4 (the hand-written block decoder), ZSTD via
ctypes-libzstd and via the pure-Python RFC 8878 decoder — plus the
COMPACT-layout walk on the real journald-252 fixture. Compressed
payloads are produced by the real encoders (`lz4` / `zstd` CLIs), so
the decoders see genuine match-heavy streams, not synthetic
literals-only blocks.

Usage: python tools/r9_journal_throughput.py [out.json]
"""

from __future__ import annotations

import json
import lzma
import struct
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import syslog_ng_spark.sources.journal_binary as jb  # noqa: E402

REPEAT = 3


def lz4_block_compress_cli(data: bytes) -> bytes:
    """Real LZ4 block via the CLI: compress to a frame, strip the frame
    shell (magic + FLG/BD/HC + one block header) to get the raw block
    journald stores."""
    frame = subprocess.run(["lz4", "-9", "-c"], input=data,
                           capture_output=True, check=True).stdout
    assert struct.unpack_from("<I", frame, 0)[0] == 0x184D2204
    flg = frame[4]
    pos = 6  # magic + FLG + BD
    if (flg >> 3) & 1:
        pos += 8  # content size
    pos += 1  # header checksum
    (bsize,) = struct.unpack_from("<I", frame, pos)
    pos += 4
    if bsize >> 31:  # stored uncompressed
        raise RuntimeError("CLI stored the block raw; data too random")
    return frame[pos: pos + (bsize & 0x7FFFFFFF)]


def zstd_compress_cli(data: bytes) -> bytes:
    return subprocess.run(["zstd", "-3", "-c"], input=data,
                          capture_output=True, check=True).stdout


def make_value(i: int) -> bytes:
    """A journald-like big value: repetitive-ish log text, ~1.3 kB."""
    line = (f"ts=17000000{i:04d} host=web-{i % 20} svc=app-{i % 5} "
            f"level=info msg=request completed path=/api/v1/items/{i} "
            f"dur_ms={i % 997} bytes={i * 37 % 9973} ").encode()
    return (b"BIGFIELD=" + line * 12)[:1300]


def build_regular_journal(n_entries: int, value_mode: str) -> tuple[bytes, int]:
    """Regular-mode journal, one big field + two small per entry.
    value_mode: raw | xz | lz4 | zstd. Returns (blob, logical_bytes) —
    logical = decoded field bytes, the number a consumer cares about."""
    def align(b: bytes) -> bytes:
        return b + b"\x00" * (-len(b) % 8)

    header_size = 264
    body = bytearray()
    off = header_size
    entry_items = []
    logical = 0
    for i in range(n_entries):
        fields = [make_value(i),
                  b"PRIORITY=6",
                  b"_HOSTNAME=vm%d" % (i % 20)]
        d_offs = []
        for f in fields:
            payload, flags = f, 0
            if len(f) > 512:
                if value_mode == "xz":
                    payload, flags = lzma.compress(f), jb.OBJECT_COMPRESSED_XZ
                elif value_mode == "lz4":
                    payload = struct.pack("<Q", len(f)) + lz4_block_compress_cli(f)
                    flags = jb.OBJECT_COMPRESSED_LZ4
                elif value_mode == "zstd":
                    payload, flags = zstd_compress_cli(f), jb.OBJECT_COMPRESSED_ZSTD
            logical += len(f)
            obj = struct.pack("<BB6x", 1, flags)
            obj += struct.pack("<Q", 16 + 48 + len(payload))
            obj += b"\x00" * 48 + payload
            d_offs.append(off)
            obj = align(obj)
            body += obj
            off += len(obj)
        entry_items.append(d_offs)
    for i, d_offs in enumerate(entry_items):
        items = b"".join(struct.pack("<QQ", o, 0) for o in d_offs)
        obj = struct.pack("<BB6x", 3, 0)
        obj += struct.pack("<Q", 16 + 48 + len(items))
        obj += struct.pack("<3Q", i + 1, 1700000000000000 + i, 42 + i)
        obj += b"\xab" * 16 + struct.pack("<Q", 0) + items
        obj = align(obj)
        body += obj
        off += len(obj)
    hdr = bytearray()
    hdr += b"LPKSHHRH"
    hdr += struct.pack("<II", 0, 0)
    hdr += b"\x00" * 8
    hdr += b"\x11" * 64
    hdr += struct.pack("<QQ", header_size, len(body))
    hdr += struct.pack("<6Q", 0, 0, 0, 0, 0, 0)
    hdr += struct.pack("<Q", n_entries)
    hdr += b"\x00" * (header_size - len(hdr))
    return bytes(hdr) + bytes(body), logical


def bench(blob: bytes, logical: int, label: str) -> dict:
    best = float("inf")
    n = 0
    for _ in range(REPEAT):
        t0 = time.perf_counter()
        n = sum(1 for _ in jb.journal_entries(blob))
        best = min(best, time.perf_counter() - t0)
    mb = logical / 1e6
    row = {
        "label": label,
        "entries": n,
        "logical_mb": round(mb, 2),
        "file_mb": round(len(blob) / 1e6, 2),
        "wall_s": round(best, 3),
        "mb_per_s": round(mb / best, 2),
        "entries_per_s": round(n / best),
    }
    print(f"{label:28s} {n:6d} entries  {mb:7.2f} MB logical  "
          f"{best:7.3f}s  {row['mb_per_s']:8.2f} MB/s  "
          f"{row['entries_per_s']:8d} entries/s")
    return row


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "SCALE_r9_journal_throughput.json"
    n = 8000
    rows = []

    blob, logical = build_regular_journal(n, "raw")
    rows.append(bench(blob, logical, "regular uncompressed"))

    blob, logical = build_regular_journal(n, "lz4")
    rows.append(bench(blob, logical, "regular + LZ4 (pure)"))

    blob, logical = build_regular_journal(n // 4, "xz")
    rows.append(bench(blob, logical, "regular + XZ (stdlib lzma)"))

    blob, logical = build_regular_journal(n, "zstd")
    rows.append(bench(blob, logical, "regular + ZSTD (ctypes)"))
    saved = jb._ZSTD_LIB
    jb._ZSTD_LIB = False
    try:
        blob2, logical2 = build_regular_journal(n // 8, "zstd")
        rows.append(bench(blob2, logical2, "regular + ZSTD (pure py)"))
    finally:
        jb._ZSTD_LIB = saved

    # COMPACT layout: the real journald-252 fixture (sparse arena, so
    # logical bytes = decoded field bytes, not the 8 MB file)
    fx = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "zstd.journal.xz"
    blob = lzma.decompress(fx.read_bytes())
    logical = sum(len(f) for e in jb.journal_entries(blob) for f in e["fields"])
    rows.append(bench(blob, logical, "COMPACT journald-252 fixture"))

    with open(out, "w") as f:
        json.dump({"n_entries": n, "repeat": REPEAT, "rows": rows}, f, indent=1)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
