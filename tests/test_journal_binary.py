"""Binary systemd-journal reader (sources/journal_binary.py) vs the
real thing: the committed fixture is a genuine journald-252-written
file (COMPACT + KEYED_HASH + ZSTD-capable flags), and when journalctl
is present its `-o export` output is the parity oracle."""

from __future__ import annotations

import lzma
import shutil
import struct
import subprocess
from pathlib import Path

import pytest

from syslog_ng_spark.sources.journal_binary import (
    JournalFormatError,
    entry_to_export_record,
    journal_entries,
)

FIXTURE = Path(__file__).parent / "fixtures" / "system.journal.xz"


@pytest.fixture(scope="module")
def journal_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("journal") / "system.journal"
    p.write_bytes(lzma.decompress(FIXTURE.read_bytes()))
    return p


@pytest.fixture(scope="module")
def entries(journal_path):
    return list(journal_entries(journal_path.read_bytes()))


def test_fixture_parses_fully(entries, journal_path):
    # header says n_entries at offset 160
    data = journal_path.read_bytes()
    (n_entries,) = struct.unpack_from("<Q", data, 160)
    assert len(entries) == n_entries > 0
    # journald writes seqnums 1..n in file order
    assert [e["seqnum"] for e in entries] == list(range(1, n_entries + 1))
    first = entries[0]
    fields = {f.split(b"=", 1)[0]: f.split(b"=", 1)[1] for f in first["fields"]}
    assert fields[b"_TRANSPORT"] == b"kernel"
    assert fields[b"MESSAGE"].startswith(b"Linux version")
    assert first["realtime_us"] > 10**15


def _parse_export(raw: bytes):
    """journalctl -o export: entries split by blank line; a line
    without '=' introduces a binary field (le64 size + payload)."""
    out = []
    i, n = 0, len(raw)
    cur: dict[bytes, bytes] = {}
    while i < n:
        j = raw.index(b"\n", i) if b"\n" in raw[i:] else n
        line = raw[i:j]
        if not line:
            if cur:
                out.append(cur)
                cur = {}
            i = j + 1
            continue
        if b"=" in line:
            k, v = line.split(b"=", 1)
            cur[k] = v
            i = j + 1
        else:
            (size,) = struct.unpack_from("<Q", raw, j + 1)
            cur[line] = raw[j + 9 : j + 9 + size]
            i = j + 9 + size + 1
    if cur:
        out.append(cur)
    return out


@pytest.mark.skipif(shutil.which("journalctl") is None, reason="no journalctl")
def test_parity_with_journalctl_export(entries, journal_path):
    """Field-for-field parity with the canonical reader on a real
    journald file: every entry journalctl emits, at the same realtime
    timestamp, with the same field dictionary."""
    raw = subprocess.run(
        ["journalctl", "--file", str(journal_path), "-o", "export", "--no-pager"],
        capture_output=True,
        check=True,
    ).stdout
    theirs = _parse_export(raw)
    assert len(theirs) == len(entries)
    ours_by_rt = {}
    for e in entries:
        d = {}
        for f in e["fields"]:
            k, v = f.split(b"=", 1)
            d[k] = v
        ours_by_rt.setdefault(e["realtime_us"], []).append(d)
    for t in theirs:
        rt = int(t[b"__REALTIME_TIMESTAMP"])
        data_fields = {
            k: v for k, v in t.items() if not k.startswith(b"__") and k != b"__CURSOR"
        }
        candidates = ours_by_rt.get(rt, [])
        assert any(c == data_fields for c in candidates), (
            rt,
            data_fields,
            candidates,
        )


def test_bad_signature_raises():
    with pytest.raises(JournalFormatError, match="signature"):
        list(journal_entries(b"NOTAJRNL" + b"\x00" * 300))


# ---------------------------------------------------------------------------
# the ZSTD era (r9): a journald-252 journal with >512-byte values —
# those data objects are OBJECT_COMPRESSED_ZSTD (journald compresses
# values over the threshold since v246, zstd by default)
# ---------------------------------------------------------------------------

ZSTD_FIXTURE = Path(__file__).parent / "fixtures" / "zstd.journal.xz"


@pytest.fixture(scope="module")
def zstd_journal_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("zjournal") / "system.journal"
    p.write_bytes(lzma.decompress(ZSTD_FIXTURE.read_bytes()))
    return p


@pytest.fixture(scope="module")
def zstd_entries(zstd_journal_path):
    return list(journal_entries(zstd_journal_path.read_bytes()))


def test_zstd_fixture_has_compressed_objects(zstd_journal_path):
    """The fixture must actually exercise the zstd path — at least one
    data object carries OBJECT_COMPRESSED_ZSTD (flag bit 4 in the
    object header), else this whole section tests nothing."""
    data = zstd_journal_path.read_bytes()
    # object walk: first object offset at header field offset 88ff —
    # cheaper and robust: scan for DATA objects (type 1) with flag 4
    # via the reader's own loud-fail: force-disable all decoders and
    # expect the documented error
    import syslog_ng_spark.sources.journal_binary as jb

    real_fn = jb._zstd_decompress
    jb._zstd_decompress = lambda payload: (_ for _ in ()).throw(
        NotImplementedError("probe"))
    try:
        with pytest.raises(NotImplementedError, match="probe"):
            list(journal_entries(data))
    finally:
        jb._zstd_decompress = real_fn


def test_zstd_fixture_parses_fully(zstd_entries, zstd_journal_path):
    data = zstd_journal_path.read_bytes()
    (n_entries,) = struct.unpack_from("<Q", data, 160)
    assert len(zstd_entries) == n_entries > 0
    # the 40 injected >512B messages decode intact, boundaries exact
    payloads = []
    bigfields = []
    for e in zstd_entries:
        for f in e["fields"]:
            if f.startswith(b"MESSAGE=payload-"):
                payloads.append(f)
            elif f.startswith(b"BIGFIELD="):
                bigfields.append(f)
    assert len(payloads) == 40
    assert len(bigfields) == 40
    for i, f in enumerate(sorted(payloads)):
        want = b"MESSAGE=" + (b"payload-%02d-" % i) + b"x" * 700 + b"-end"
        assert f == want
    for i, f in enumerate(sorted(bigfields)):
        want = b"BIGFIELD=" + (b"blob-%02d-" % i) + (b"ABCDEFGH%02d" % i) * 120
        assert f == want


def test_zstd_pure_decoder_matches_ctypes_on_journal(zstd_journal_path):
    """Force the pure-Python RFC 8878 decoder (zstd_pure.py) for every
    zstd object in the journal and compare entry-for-entry with the
    ctypes-libzstd fast path."""
    import syslog_ng_spark.sources.journal_binary as jb

    data = zstd_journal_path.read_bytes()
    fast = [e["fields"] for e in journal_entries(data)]
    saved = jb._ZSTD_LIB
    jb._ZSTD_LIB = False  # pure decoder only (zstandard pkg is absent)
    try:
        pure = [e["fields"] for e in journal_entries(data)]
    finally:
        jb._ZSTD_LIB = saved
    assert fast == pure


@pytest.mark.skipif(shutil.which("journalctl") is None, reason="no journalctl")
def test_zstd_parity_with_journalctl_export(zstd_entries, zstd_journal_path):
    """Same field-for-field journalctl parity as the first-era fixture,
    now across zstd-compressed values."""
    raw = subprocess.run(
        ["journalctl", "--file", str(zstd_journal_path), "-o", "export",
         "--no-pager"],
        capture_output=True,
        check=True,
    ).stdout
    theirs = _parse_export(raw)
    assert len(theirs) == len(zstd_entries)
    ours_by_rt = {}
    for e in zstd_entries:
        d = {}
        for f in e["fields"]:
            k, v = f.split(b"=", 1)
            d[k] = v
        ours_by_rt.setdefault(e["realtime_us"], []).append(d)
    for t in theirs:
        rt = int(t[b"__REALTIME_TIMESTAMP"])
        data_fields = {
            k: v for k, v in t.items() if not k.startswith(b"__") and k != b"__CURSOR"
        }
        candidates = ours_by_rt.get(rt, [])
        assert any(c == data_fields for c in candidates), (rt, len(candidates))


def test_unknown_incompat_flag_raises():
    hdr = bytearray(b"LPKSHHRH")
    hdr += struct.pack("<II", 0, 0x40)  # unknown incompatible bit
    hdr += b"\x00" * 300
    with pytest.raises(JournalFormatError, match="incompatible"):
        list(journal_entries(bytes(hdr)))


def _build_regular_journal(fields_per_entry, compress_xz=()):
    """Minimal NON-compact journal: header + data objects + one entry
    per fields list. Exercises the regular (le64-item) branch and the
    XZ object-compression branch the fixture can't (journald 252 used
    compact + no compressed payloads at these sizes)."""
    import lzma as _lzma

    def align(b):
        return b + b"\x00" * (-len(b) % 8)

    header_size = 264
    body = b""
    offsets = []
    off = header_size
    entry_specs = []
    for fields in fields_per_entry:
        d_offs = []
        for f in fields:
            payload = f
            flags = 0
            if f in compress_xz:
                payload = _lzma.compress(f)
                flags = 1  # OBJECT_COMPRESSED_XZ
            obj = struct.pack("<BB6x", 1, flags)
            obj += struct.pack("<Q", 16 + 48 + len(payload))
            obj += b"\x00" * 48 + payload
            d_offs.append(off)
            obj = align(obj)
            body += obj
            off += len(obj)
        entry_specs.append(d_offs)
    n_entries = 0
    for i, d_offs in enumerate(entry_specs):
        items = b"".join(struct.pack("<QQ", o, 0) for o in d_offs)
        obj = struct.pack("<BB6x", 3, 0)
        obj += struct.pack("<Q", 16 + 48 + len(items))
        obj += struct.pack("<3Q", i + 1, 1700000000000000 + i, 42 + i)
        obj += b"\xab" * 16 + struct.pack("<Q", 0) + items
        obj = align(obj)
        body += obj
        off += len(obj)
        n_entries += 1
    hdr = bytearray()
    hdr += b"LPKSHHRH"
    hdr += struct.pack("<II", 0, 0)  # no incompatible flags: regular mode
    hdr += b"\x00" * 8  # state + reserved
    hdr += b"\x11" * 64  # four ids
    hdr += struct.pack("<QQ", header_size, len(body))
    hdr += struct.pack("<6Q", 0, 0, 0, 0, 0, 0)
    hdr += struct.pack("<Q", n_entries)
    hdr += b"\x00" * (header_size - len(hdr))
    return bytes(hdr) + body


def test_regular_mode_and_xz_objects():
    fields = [
        [b"MESSAGE=hello world", b"PRIORITY=6"],
        [b"MESSAGE=" + b"x" * 600, b"_HOSTNAME=vm"],
    ]
    blob = _build_regular_journal(fields, compress_xz={fields[1][0]})
    got = list(journal_entries(blob))
    assert [e["seqnum"] for e in got] == [1, 2]
    assert got[0]["fields"] == fields[0]
    assert got[1]["fields"] == fields[1]  # xz object round-tripped
    rec = entry_to_export_record(got[0])
    assert "__REALTIME_TIMESTAMP=1700000000000000" in rec
    assert "MESSAGE=hello world" in rec


def test_spark_pipeline_to_canonical_logs(spark, journal_path):
    from syslog_ng_spark.sources.journal_binary import journal_binary_as_logs

    logs = journal_binary_as_logs(spark, str(journal_path))
    rows = logs.select(
        "ts", "host", "program", "severity", "facility", "message", "sdata"
    ).collect()
    assert len(rows) == 337
    kernel = [r for r in rows if r.program == "kernel"]
    assert kernel and kernel[0].message.startswith("Linux version")
    assert all(r.host == "vm" for r in rows if r.host)
    assert {r.severity for r in rows} <= set(range(8)) | {None}
    assert any(".journald.MESSAGE" in r.sdata for r in rows)
    # address fields came through the same path as export streams
    assert all("__SEQNUM" not in (r.message or "") for r in rows)


def test_lz4_block_decoder_spec_vector():
    """Hand-assembled LZ4 block per the public block-format spec:
    literals 'abc', then a 9-byte match at offset 3 (overlapping copy
    must replicate), then a literal tail 'd'."""
    from syslog_ng_spark.sources.journal_binary import lz4_block_decompress

    block = bytes([0x35]) + b"abc" + bytes([0x03, 0x00]) + bytes([0x10]) + b"d"
    assert lz4_block_decompress(block, 13) == b"abcabcabcabcd"


def test_lz4_block_decoder_long_lengths_and_errors():
    import pytest

    from syslog_ng_spark.sources.journal_binary import (
        JournalFormatError,
        lz4_block_decompress,
    )

    # literal length 15 + 240 = 255 via extension byte 240
    lits = bytes(range(256)) * 1
    block = bytes([0xF0, 240]) + lits[:255]
    assert lz4_block_decompress(block, 255) == lits[:255]
    # match length 15+4 + ext 10 = 29
    block = bytes([0x1F]) + b"a" + bytes([0x01, 0x00, 10])
    assert lz4_block_decompress(block, 30) == b"a" * 30
    with pytest.raises(JournalFormatError, match="offset"):
        lz4_block_decompress(bytes([0x14]) + b"a" + bytes([0x05, 0x00]), 9)
    with pytest.raises(JournalFormatError, match="expected"):
        lz4_block_decompress(bytes([0x10]) + b"a", 7)
    # truncated blocks must raise JournalFormatError, never bare
    # IndexError: cut mid-literal-extension, mid-offset, mid-match-ext
    for trunc in (
        bytes([0xF0]),                        # ext byte missing
        bytes([0x14]) + b"a" + bytes([0x01]),  # offset second byte missing
        bytes([0x1F]) + b"a" + bytes([0x01, 0x00]),  # match ext missing
    ):
        with pytest.raises(JournalFormatError, match="truncated"):
            lz4_block_decompress(trunc, 100)


def test_lz4_journal_object_roundtrip():
    """A regular-mode journal whose big field is LZ4-compressed with a
    literals-only block we assemble ourselves (valid LZ4), exercising
    the _decompress LZ4 branch end-to-end without the lz4 package."""
    import struct

    field = b"MESSAGE=" + b"y" * 300
    # literals-only block: 15 + ext bytes for len 308
    ext = []
    rem = len(field) - 15
    while rem >= 255:
        ext.append(255)
        rem -= 255
    ext.append(rem)
    block = bytes([0xF0] + ext) + field
    payload = struct.pack("<Q", len(field)) + block

    blob = _build_regular_journal([[b"PRIORITY=6"]])
    # splice: append a data object with LZ4 flag + an entry for it
    import syslog_ng_spark.sources.journal_binary as jb

    def align(b):
        return b + b"\x00" * (-len(b) % 8)

    body_off = len(blob)
    dobj = align(
        struct.pack("<BB6x", 1, jb.OBJECT_COMPRESSED_LZ4)
        + struct.pack("<Q", 16 + 48 + len(payload))
        + b"\x00" * 48
        + payload
    )
    items = struct.pack("<QQ", body_off, 0)
    eobj = align(
        struct.pack("<BB6x", 3, 0)
        + struct.pack("<Q", 16 + 48 + len(items))
        + struct.pack("<3Q", 2, 1700000000000001, 43)
        + b"\xab" * 16
        + struct.pack("<Q", 0)
        + items
    )
    got = list(jb.journal_entries(blob + dobj + eobj))
    assert len(got) == 2
    assert got[1]["fields"] == [field]


def test_fuzz_corrupt_journal_always_raises_format_error(zstd_journal_path):
    """Mutated real journals and raw random bytes raise
    JournalFormatError/NotImplementedError, never a bare struct.error
    or IndexError."""
    import random

    rng = random.Random(55)
    good = zstd_journal_path.read_bytes()[:20000]
    for trial in range(400):
        if trial % 2:
            b = bytearray(good)
            for _ in range(rng.randint(1, 10)):
                op = rng.randrange(3)
                if op == 0 and b:
                    b[rng.randrange(len(b))] = rng.randrange(256)
                elif op == 1 and len(b) > 300:
                    del b[rng.randrange(len(b)):]
                else:
                    pos = rng.randrange(len(b) + 1)
                    b[pos:pos] = bytes(rng.randrange(256)
                                       for _ in range(rng.randint(1, 6)))
            payload = bytes(b)
        else:
            payload = bytes(rng.randrange(256)
                            for _ in range(rng.randint(0, 400)))
        try:
            list(journal_entries(payload))
        except (JournalFormatError, NotImplementedError):
            pass


def test_since_seqnum_incremental(entries, journal_path):
    data = journal_path.read_bytes()
    mid = entries[len(entries) // 2]["seqnum"]
    tail = list(journal_entries(data, since_seqnum=mid))
    assert [e["seqnum"] for e in tail] == [
        e["seqnum"] for e in entries if e["seqnum"] > mid
    ]


def test_incremental_spark_read_over_growing_journal(spark, tmp_path):
    """The cursor recipe end-to-end on a REAL growing journal: the two
    committed fixtures are snapshots of the same journald file
    (seqnums 1..337, then the same plus the zstd-era appends to 381).
    Read snapshot 1 → journal_cursors → re-read the grown file with
    `since` → exactly the delta, nothing re-emitted, nothing missed."""
    from syslog_ng_spark.sources.journal_binary import (
        journal_cursors,
        read_journal_binary,
    )

    d = tmp_path / "j"
    d.mkdir()
    target = d / "system.journal"
    target.write_bytes(lzma.decompress(FIXTURE.read_bytes()))
    first = read_journal_binary(spark, str(d))
    n1 = first.count()
    cursors = journal_cursors(first)
    assert n1 == 337
    assert list(cursors.values()) == [337]
    # the journal grows in place (journald appends; same file path)
    target.write_bytes(lzma.decompress(ZSTD_FIXTURE.read_bytes()))
    delta = read_journal_binary(spark, str(d), since=cursors)
    rows = delta.select("seqnum").collect()
    assert sorted(r["seqnum"] for r in rows) == list(range(338, 382))
    # an int cursor applies to every file; 0/None reads from the start
    assert read_journal_binary(spark, str(d), since=337).count() == 44
    assert read_journal_binary(spark, str(d)).count() == 381


def test_incremental_via_declarative_config(spark, tmp_path):
    """The systemd-journal config kind exposes the cursor: `since` in
    the spec produces exactly the delta as canonical log rows."""
    from syslog_ng_spark.config import build_pipeline

    d = tmp_path / "j"
    d.mkdir()
    (d / "system.journal").write_bytes(lzma.decompress(ZSTD_FIXTURE.read_bytes()))
    full = build_pipeline(
        spark, {"source": {"kind": "systemd-journal", "path": str(d)}}
    )
    part = build_pipeline(
        spark,
        {"source": {"kind": "systemd-journal", "path": str(d), "since": 337}},
    )
    assert full.count() == 381
    rows = part.collect()
    assert len(rows) == 44
    msgs = [r["message"] for r in rows if r["message"].startswith("payload-")]
    assert len(msgs) == 40  # the zstd-era appends, decoded


@pytest.mark.skipif(shutil.which("zstd") is None, reason="no zstd CLI")
def test_zstd_decompress_frame_without_content_size():
    """journald always writes a frame content size, but the ctypes
    fast path must stay robust for frames without one (`zstd
    --no-content-size`): the doubling buffer grows ×8 and always
    tries _ZSTD_MAX_VALUE itself before falling through (r10 fix —
    previously values between the last tried cap and the max silently
    dropped to the pure-Python decoder)."""
    import subprocess

    data = b"journal value without FCS " * 4000  # ~100 KiB > first cap
    comp = subprocess.run(
        ["zstd", "--no-content-size", "-c"],
        input=data, capture_output=True, check=True).stdout
    from syslog_ng_spark.sources import journal_binary as jb

    # sanity: the frame really has no FCS
    lib = jb._zstd_ctypes()
    if lib is not None:
        assert lib.ZSTD_getFrameContentSize(comp, len(comp)) == 2**64 - 1
    assert jb._zstd_decompress(comp) == data
