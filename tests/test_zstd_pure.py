"""Pure-Python zstd decoder (sources/zstd_pure.py) vs the real
encoder: round-trips through the `zstd` CLI at several levels, an
adversarial hypothesis property test, hand-assembled frames for the
raw/RLE/skippable paths, and the documented error surfaces."""

from __future__ import annotations

import shutil
import struct
import subprocess

import pytest

from syslog_ng_spark.sources.zstd_pure import ZstdError, decompress

HAVE_CLI = shutil.which("zstd") is not None


def zc(data: bytes, level: int = 3) -> bytes:
    return subprocess.run(
        ["zstd", f"-{level}", "-c"], input=data, capture_output=True, check=True
    ).stdout


@pytest.mark.skipif(not HAVE_CLI, reason="no zstd CLI")
@pytest.mark.parametrize("level", [1, 3, 19])
def test_cli_round_trips(level):
    import os

    cases = [
        b"",
        b"a",
        b"hello world " * 100,                 # matches + repeat offsets
        bytes(range(256)) * 40,                # full alphabet, FSE tables
        os.urandom(4096),                      # incompressible: raw blocks
        b"ABCD" * 5000,                        # long periodic matches
        b"x" * 200000,                         # RLE-able, multi-block
        ("the quick brown fox jumps over the lazy dog. " * 400).encode(),
    ]
    for c in cases:
        assert decompress(zc(c, level)) == c


@pytest.mark.skipif(not HAVE_CLI, reason="no zstd CLI")
def test_cli_round_trip_large_text():
    # a real repository file: exercises 4-stream Huffman literals,
    # FSE-compressed weights, treeless repeats across blocks
    with open("/root/repo/syslog_ng_spark/catalog.py", "rb") as f:
        data = f.read()
    for level in (1, 19):
        assert decompress(zc(data, level)) == data


@pytest.mark.skipif(not HAVE_CLI, reason="no zstd CLI")
def test_hypothesis_parity_with_cli():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=0, max_size=4096),
           st.sampled_from([1, 3, 9]))
    def check(data, level):
        assert decompress(zc(data, level)) == data

    check()


@pytest.mark.skipif(not HAVE_CLI, reason="no zstd CLI")
def test_multi_frame_concatenation():
    z = zc(b"first|") + zc(b"second") + zc(b"|third " * 50)
    assert decompress(z) == b"first|second" + b"|third " * 50


def _frame(blocks: bytes, fcs: int | None = None) -> bytes:
    """Minimal hand-built frame: single-segment, optional 1-byte FCS."""
    if fcs is None:
        fhd = 0x00  # no single-segment: window descriptor follows
        return struct.pack("<I", 0xFD2FB528) + bytes([fhd, 0x00]) + blocks
    fhd = 0x20  # single segment -> 1-byte frame content size
    return struct.pack("<I", 0xFD2FB528) + bytes([fhd, fcs]) + blocks


def _block_header(last: int, btype: int, size: int) -> bytes:
    v = last | (btype << 1) | (size << 3)
    return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])


def test_hand_built_raw_and_rle_blocks():
    raw = _block_header(0, 0, 5) + b"hello"
    rle = _block_header(1, 1, 6) + b"!"
    assert decompress(_frame(raw + rle, fcs=11)) == b"hello!!!!!!"


def test_skippable_frame_is_skipped():
    skip = struct.pack("<II", 0x184D2A50, 4) + b"meta"
    real = _frame(_block_header(1, 0, 2) + b"ok", fcs=2)
    assert decompress(skip + real) == b"ok"


def test_error_surfaces():
    with pytest.raises(ZstdError, match="magic"):
        decompress(b"\x00\x00\x00\x00rest")
    with pytest.raises(ZstdError, match="truncated"):
        decompress(b"\x28\xb5")
    # declared content size must match
    bad = _frame(_block_header(1, 0, 2) + b"ok", fcs=3)
    with pytest.raises(ZstdError, match="declared"):
        decompress(bad)
    # reserved block type
    res = _frame(_block_header(1, 3, 2) + b"xx", fcs=2)
    with pytest.raises(ZstdError, match="reserved"):
        decompress(res)
    # dictionary ID
    dframe = struct.pack("<I", 0xFD2FB528) + bytes([0x21, 7, 2]) + \
        _block_header(1, 0, 2) + b"ok"
    with pytest.raises(ZstdError, match="dictionar"):
        decompress(dframe)


@pytest.mark.skipif(not HAVE_CLI, reason="no zstd CLI")
def test_fuzz_corrupt_stream_always_raises_zstd_error():
    """Mutated real frames and raw random bytes raise ZstdError, never
    a bare IndexError."""
    import random

    rng = random.Random(77)
    good = zc(b"the quick brown fox " * 30)
    for trial in range(600):
        if trial % 2:
            b = bytearray(good)
            for _ in range(rng.randint(1, 10)):
                op = rng.randrange(3)
                if op == 0 and b:
                    b[rng.randrange(len(b))] = rng.randrange(256)
                elif op == 1 and len(b) > 8:
                    del b[rng.randrange(len(b)):]
                else:
                    pos = rng.randrange(len(b) + 1)
                    b[pos:pos] = bytes(rng.randrange(256)
                                       for _ in range(rng.randint(1, 6)))
            payload = bytes(b)
        else:
            payload = bytes(rng.randrange(256)
                            for _ in range(rng.randint(0, 300)))
        try:
            decompress(payload, max_output=1 << 22)
        except ZstdError:
            pass


def test_output_cap_enforced():
    rle = _frame(_block_header(1, 1, 1 << 16) + b"x")
    with pytest.raises(ZstdError, match="cap"):
        decompress(rle, max_output=1024)


@pytest.mark.skipif(not HAVE_CLI, reason="no zstd CLI")
def test_longhand_sequence_count_over_32512():
    """RFC 8878 §3.1.1.3.2.1 longhand header: byte0==255 means
    Number_of_Sequences = LE16(byte1,byte2) + 0x7F00 — an ADDITION.
    The pre-r10 bitwise-OR lost the carry for blocks with >=32512
    sequences. Craft such a block: a 4096-token dictionary preamble
    followed by random 3-byte tokens forces ~3.5-byte sequences;
    btultra2 + minMatch=3 emits >36k sequences in the first 128 KiB
    block. Assert the longhand path is actually exercised AND the
    decode round-trips."""
    import random

    from syslog_ng_spark.sources import zstd_pure

    rng = random.Random(11)
    toks = [bytes([i & 0xFF, (i >> 8) & 0xFF, (i * 7) & 0xFF])
            for i in range(4096)]
    data = b"".join(toks) + b"".join(rng.choice(toks) for _ in range(45000))
    comp = subprocess.run(
        ["zstd", "-f", "--zstd=strategy=7,minMatch=3,targetLength=4096",
         "--no-check", "-c"],
        input=data, capture_output=True, check=True).stdout

    seen = []
    orig = zstd_pure._decode_sequences

    def spy(d, ctx):
        b0 = d[0]
        if b0 == 255:
            seen.append((d[1] | (d[2] << 8)) + 0x7F00)
        return orig(d, ctx)

    zstd_pure._decode_sequences = spy
    try:
        out = decompress(comp, max_output=1 << 24)
    finally:
        zstd_pure._decode_sequences = orig
    assert out == data
    assert seen and max(seen) > 0x7F00, \
        "fixture no longer exercises the 255-byte longhand header"
