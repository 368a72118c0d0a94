"""Binary systemd-journal file reader — pure Python, no libsystemd.

Reference: modules/systemd-journal/journald-subsystem.c binds
libsystemd's sd_journal API at runtime; this module instead parses the
journal FILE FORMAT directly (the format is public and stable —
systemd's docs/JOURNAL_FILE_FORMAT.md — and what `journalctl` itself
reads), so the engine ingests `.journal` files with zero native
dependencies. Parity is pytested against `journalctl -o export` on a
real journald-written file (tests/fixtures/system.journal.xz).

Layout essentials (verified against a systemd 252 file):

- Header: 'LPKSHHRH' signature, le32 compatible/incompatible flags,
  state byte, 4×16-byte ids, then le64 header_size/arena_size/... .
  Incompatible flags gate readability: COMPRESSED_XZ(1),
  COMPRESSED_LZ4(2), KEYED_HASH(4), COMPRESSED_ZSTD(8), COMPACT(16).
  KEYED_HASH only changes hash verification (we don't verify);
  COMPACT shrinks entry items to le32 and widens DataObject by 8
  bytes; the COMPRESSED_* flags merely declare that data objects MAY
  carry that compression.
- Objects follow from header_size, 8-byte aligned, each with a
  16-byte header (u8 type, u8 flags, 6 reserved, le64 size).
- ENTRY objects (type 3): seqnum/realtime/monotonic le64, boot_id 16,
  xor_hash le64, then items — (le64 offset, le64 hash) pairs, or
  bare le32 offsets in COMPACT files.
- DATA objects (type 1): 48 bytes of hash/offset bookkeeping (+8 in
  COMPACT), then the 'FIELD=value' payload. Object flag 1 = XZ
  (stdlib lzma), 2 = LZ4, 4 = ZSTD (journald compresses only values
  over a size threshold, so most objects are raw).

The reader does ONE sequential scan of the file — no hash tables, no
entry-array chains — which is both the simplest correct strategy and
the Spark-friendly one: whole files stream through `binaryFile` +
mapInPandas, entries explode into rows, and the existing
`journal_export_parser` maps fields to the canonical log schema, so
binary files and `journalctl -o export` streams share one semantic
path.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator, Mapping

HEADER_SIGNATURE = b"LPKSHHRH"

INCOMPAT_COMPRESSED_XZ = 1
INCOMPAT_COMPRESSED_LZ4 = 2
INCOMPAT_KEYED_HASH = 4
INCOMPAT_COMPRESSED_ZSTD = 8
INCOMPAT_COMPACT = 16
_INCOMPAT_KNOWN = 0x1F

OBJECT_DATA = 1
OBJECT_ENTRY = 3

OBJECT_COMPRESSED_XZ = 1
OBJECT_COMPRESSED_LZ4 = 2
OBJECT_COMPRESSED_ZSTD = 4


class JournalFormatError(ValueError):
    pass


def lz4_block_decompress(data: bytes, usize: int) -> bytes:
    """Pure-Python LZ4 *block* decoder (the raw block format, not the
    frame format): sequences of [token][literal-len ext][literals]
    [le16 offset][match-len ext], overlapping match copies done
    byte-forward as the spec requires (offset < length replicates).
    Journal LZ4 data objects are one block prefixed with the le64
    uncompressed size; journald used LZ4 by default before the zstd
    switch, so old journals need this with no native lib."""
    out = bytearray()
    i, n = 0, len(data)
    try:
        while i < n:
            token = data[i]
            i += 1
            lit_len = token >> 4
            if lit_len == 15:
                while True:
                    b = data[i]
                    i += 1
                    lit_len += b
                    if b != 255:
                        break
            out += data[i : i + lit_len]
            i += lit_len
            if i >= n:
                break  # last sequence: literals only
            offset = data[i] | (data[i + 1] << 8)
            i += 2
            if offset == 0:
                raise JournalFormatError("lz4 block: zero match offset")
            match_len = (token & 0x0F) + 4
            if (token & 0x0F) == 15:
                while True:
                    b = data[i]
                    i += 1
                    match_len += b
                    if b != 255:
                        break
            start = len(out) - offset
            if start < 0:
                raise JournalFormatError("lz4 block: offset before start")
            if offset >= match_len:  # disjoint: one slice copy
                out += out[start: start + match_len]
            else:
                # overlapping byte-forward copy replicates the last
                # `offset` bytes — equivalent to tiling that period
                # (C-speed bytes multiply), not a per-byte loop
                seg = bytes(out[start: start + offset])
                out += (seg * (match_len // offset + 1))[:match_len]
    except IndexError as e:
        # truncated block: an extension byte / offset read past the end
        raise JournalFormatError("lz4 block: truncated input") from e
    if len(out) != usize:
        raise JournalFormatError(
            f"lz4 block: decoded {len(out)} bytes, expected {usize}"
        )
    return bytes(out)


def _decompress(flags: int, payload: bytes) -> bytes:
    if flags & OBJECT_COMPRESSED_XZ:
        import lzma

        return lzma.decompress(payload)
    if flags & OBJECT_COMPRESSED_LZ4:
        # journal LZ4 payload: le64 uncompressed size + one raw block
        (usize,) = struct.unpack_from("<Q", payload, 0)
        try:
            import lz4.block  # type: ignore[import-not-found]

            return lz4.block.decompress(payload[8:], uncompressed_size=usize)
        except ImportError:
            return lz4_block_decompress(payload[8:], usize)
    if flags & OBJECT_COMPRESSED_ZSTD:
        return _zstd_decompress(payload)
    return payload


def _zstd_ctypes():
    """ctypes binding to the system libzstd, if present — the fast
    path for bulk journal decode (one C call per data object). Cached
    after first probe; falls through to the pure-Python RFC 8878
    decoder (zstd_pure.py) when the shared library is absent."""
    global _ZSTD_LIB
    if _ZSTD_LIB is not None:
        return _ZSTD_LIB or None
    import ctypes
    import ctypes.util

    name = ctypes.util.find_library("zstd") or "libzstd.so.1"
    try:
        lib = ctypes.CDLL(name)
        lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
        lib.ZSTD_getFrameContentSize.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.ZSTD_decompress.restype = ctypes.c_size_t
        lib.ZSTD_decompress.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        _ZSTD_LIB = lib
    except OSError:
        _ZSTD_LIB = False
        return None
    return _ZSTD_LIB


_ZSTD_LIB = None
# journal values are hard-capped by journald (DATA_SIZE_MAX 1G); a
# content size above this in a frame header is corruption, not data
_ZSTD_MAX_VALUE = 1 << 30


_ZSTANDARD = None  # cached module probe: a FAILING import per value
# costs ~0.4 ms of sys.path scanning — measured 50x the decode itself


def _zstd_decompress(payload: bytes) -> bytes:
    """OBJECT_COMPRESSED_ZSTD value decode: `zstandard` package if
    installed, else ctypes-libzstd, else the pure-Python RFC 8878
    decoder — always available, so the zstd journal era needs no
    environment support at all."""
    global _ZSTANDARD
    if _ZSTANDARD is None:
        try:
            import zstandard  # type: ignore[import-not-found]

            _ZSTANDARD = zstandard
        except ImportError:
            _ZSTANDARD = False
    if _ZSTANDARD:
        return _ZSTANDARD.ZstdDecompressor().decompress(payload)
    lib = _zstd_ctypes()
    if lib is not None:
        import ctypes

        usize = lib.ZSTD_getFrameContentSize(payload, len(payload))
        if usize == 2**64 - 1:  # ZSTD_CONTENTSIZE_UNKNOWN: no FCS in
            # the frame header (journald always writes one, but be
            # robust) — decompress into a doubling buffer
            cap = min(max(4 * len(payload), 1 << 16), _ZSTD_MAX_VALUE)
            while True:
                buf = ctypes.create_string_buffer(cap)
                ret = lib.ZSTD_decompress(buf, cap, payload, len(payload))
                if not lib.ZSTD_isError(ret):
                    return buf.raw[: int(ret)]
                if cap >= _ZSTD_MAX_VALUE:
                    break  # even the max documented value size failed
                # grow ×8 but always TRY the max itself before giving
                # up, so the fast path covers the full value range
                cap = min(cap * 8, _ZSTD_MAX_VALUE)
        elif 0 <= usize <= _ZSTD_MAX_VALUE:
            buf = ctypes.create_string_buffer(int(usize))
            ret = lib.ZSTD_decompress(buf, int(usize), payload, len(payload))
            if not lib.ZSTD_isError(ret):
                return buf.raw[: int(ret)]
        # (unsigned)-2 = not a frame / errors: fall through to the pure
        # decoder, which raises the precise format error itself
    from syslog_ng_spark.sources.zstd_pure import decompress as _pure

    return _pure(payload, max_output=_ZSTD_MAX_VALUE)


def journal_entries(data: bytes, since_seqnum: int = 0) -> Iterator[dict]:
    """Parse one journal file's bytes; yield per-entry dicts:
    {seqnum, realtime_us, monotonic_us, boot_id, fields: [bytes...]}.
    Fields are raw 'FIELD=value' byte strings (journal values may be
    arbitrary bytes). One sequential object walk; entries yield in
    file order (== seqnum order for journald-written files).
    `since_seqnum` skips entries at or below it — the cursor shape for
    incremental batch ingestion of a growing journal (journald only
    appends; record max seqnum per file, pass it next run).

    Truncated/corrupt files raise JournalFormatError — never a bare
    struct.error or IndexError (fuzz-enforced in tests)."""
    it = _journal_entries_inner(data, since_seqnum)
    while True:
        try:
            yield next(it)
        except StopIteration:
            return
        except (struct.error, IndexError) as e:
            raise JournalFormatError(f"truncated or corrupt journal: {e}") from e


def _journal_entries_inner(data: bytes, since_seqnum: int = 0) -> Iterator[dict]:
    if data[:8] != HEADER_SIGNATURE:
        raise JournalFormatError("not a systemd journal file (bad signature)")
    compat, incompat = struct.unpack_from("<II", data, 8)
    unknown = incompat & ~_INCOMPAT_KNOWN
    if unknown:
        raise JournalFormatError(
            f"journal file uses unknown incompatible flags {unknown:#x}"
        )
    compact = bool(incompat & INCOMPAT_COMPACT)
    (header_size,) = struct.unpack_from("<Q", data, 88)
    # DataObject payload offset: 16 obj header + 48 bookkeeping
    # (+ le32 tail_entry_array_offset + le32 n_entries in compact files)
    data_payload_off = 72 if compact else 64
    item_fmt, item_width = ("<I", 4) if compact else ("<QQ", 16)

    def data_payload(off: int) -> bytes:
        if off + 16 > len(data) or data[off] != OBJECT_DATA:
            raise JournalFormatError(f"entry item points at non-data object @{off}")
        (dsize,) = struct.unpack_from("<Q", data, off + 8)
        return _decompress(
            data[off + 1], bytes(data[off + data_payload_off : off + dsize])
        )

    off = header_size
    end = len(data)
    while off + 16 <= end:
        otype, _oflags = data[off], data[off + 1]
        (size,) = struct.unpack_from("<Q", data, off + 8)
        if otype == 0 or size < 16 or off + size > end:
            break  # zero-filled tail of the pre-allocated arena
        if otype == OBJECT_ENTRY:
            seqnum, realtime, monotonic = struct.unpack_from("<3Q", data, off + 16)
            if seqnum <= since_seqnum:
                off = (off + size + 7) & ~7
                continue
            boot_id = data[off + 40 : off + 56].hex()
            items_off, items_len = off + 64, size - 64
            n_items = items_len // item_width
            fields = []
            for i in range(n_items):
                item = struct.unpack_from(item_fmt, data, items_off + i * item_width)
                d_off = item[0]
                if d_off == 0:
                    continue
                fields.append(data_payload(d_off))
            yield {
                "seqnum": seqnum,
                "realtime_us": realtime,
                "monotonic_us": monotonic,
                "boot_id": boot_id,
                "fields": fields,
            }
        off = (off + size + 7) & ~7


def entry_to_export_record(entry: dict) -> str:
    """Render one parsed entry in `journalctl -o export` text form:
    address fields first, then the data fields, newline-separated.
    Binary values (non-UTF8 / embedded newlines) are skipped — the
    same §6 non-goal as the export-format adapter's line model
    (parsers.journal_export_records), so both ingestion paths feed
    journal_export_parser identical shapes."""
    lines = [
        f"__REALTIME_TIMESTAMP={entry['realtime_us']}",
        f"__MONOTONIC_TIMESTAMP={entry['monotonic_us']}",
        f"__SEQNUM={entry['seqnum']}",
        f"_BOOT_ID_ADDR={entry['boot_id']}",
    ]
    for f in entry["fields"]:
        try:
            text = f.decode("utf-8")
        except UnicodeDecodeError:
            continue
        if "\n" in text or "=" not in text:
            continue
        lines.append(text)
    return "\n".join(lines)


def read_journal_binary(spark, path, since=None):
    """`.journal` files → one row per entry: (file, seqnum, record)
    where `record` is export-format text ready for
    `journal_export_parser`. Whole files stream through the binaryFile
    source (payload crosses into Python once per file, Arrow-batched);
    at cluster scale parallelism = file count, which matches journald's
    natural sharding (one active file per machine/boot plus rotated
    archives).

    `since` is the incremental-ingestion cursor (journald only
    appends, so seqnum-per-file is a complete position): an int
    applies to every file, a mapping {file_path: seqnum} (the shape
    `journal_cursors` returns — keys are the binaryFile `path` URIs)
    applies per file, files not in the mapping read from the start.
    Entries with seqnum <= the cursor are skipped inside the object
    walk (journal_entries), so a cursor-complete file costs one header
    read, not a decode. Recipe: df = read_journal_binary(...);
    process; cursors = journal_cursors(df); persist the dict; pass it
    as `since` next run — the second read yields exactly the delta."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    since_map = since if isinstance(since, Mapping) else None
    since_all = int(since) if isinstance(since, int) else 0

    def run(batches):
        for pdf in batches:
            out_path, out_seq, out_rec = [], [], []
            for p, content in zip(pdf["path"], pdf["content"]):
                cursor = since_map.get(p, 0) if since_map is not None else since_all
                for e in journal_entries(bytes(content), since_seqnum=cursor):
                    out_path.append(p)
                    out_seq.append(e["seqnum"])
                    out_rec.append(entry_to_export_record(e))
            yield pd.DataFrame(
                {"file": out_path, "seqnum": out_seq, "record": out_rec}
            )

    return files.select("path", "content").mapInPandas(
        run, schema="file string, seqnum long, record string"
    )


def journal_cursors(df) -> dict[str, int]:
    """Max seqnum per journal file — the cursor table to persist and
    pass back as `since` on the next incremental read. Driver-sized by
    construction: one row per .journal FILE (journald keeps one active
    file per machine/boot plus rotated archives), not per entry."""
    from pyspark.sql import functions as F

    rows = df.groupBy("file").agg(F.max("seqnum").alias("seqnum")).collect()
    return {r["file"]: r["seqnum"] for r in rows}


def journal_binary_as_logs(spark, path, prefix: str = ".journald.", since=None):
    """Binary journal files → canonical log schema, via the SAME
    field-mapping path as the export-format source
    (parsers.journal_export_parser: MESSAGE→message, _HOSTNAME→host,
    PRIORITY→severity, SYSLOG_FACILITY→facility, SYSLOG_IDENTIFIER
    falling back to _COMM→program, __REALTIME_TIMESTAMP→ts, all
    fields into sdata under `prefix`). `since` = incremental cursor,
    see read_journal_binary."""
    from syslog_ng_spark.operators.parsers import journal_export_parser

    return journal_export_parser(
        read_journal_binary(spark, path, since=since), "record", prefix
    )
