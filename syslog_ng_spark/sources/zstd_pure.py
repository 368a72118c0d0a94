"""Pure-Python Zstandard frame decoder (RFC 8878).

Closes the last journald compression era for the binary `.journal`
reader (sources/journal_binary.py): systemd defaults to ZSTD for
values over ~512 bytes since v246, so any modern journal with a large
MESSAGE hits OBJECT_COMPRESSED_ZSTD. The XZ era uses stdlib lzma and
the LZ4 era the hand-written block decoder in journal_binary.py; this
module is the same genre for ZSTD — written from the public RFC 8878
specification (the reference daemon links libzstd via
src/basic/compress.c; there is no C to translate, only the format).

Scope: full single/multi-frame decoding — FSE (tANS) table
construction and bitstream, Huffman literals (1- and 4-stream, direct
and FSE-compressed weight descriptions, treeless repeats), all three
sequence-table modes (predefined / RLE / FSE / repeat), repeat-offset
history, raw/RLE blocks, skippable frames. Dictionaries are NOT
supported (journald never uses them) and content checksums are
skipped, not verified (xxhash64 would be dead weight here).

Performance shape: the decoder is for journal VALUES — objects of a
few hundred bytes to a few MB. The backward bitstream keeps the
int.from_bytes window approach (Python-int shifts), fine at that
scale; bulk literal/match copies are bytearray slices. The fast path
for big estates is ctypes-libzstd (journal_binary._decompress tries
it first); this decoder is the always-available floor.
"""

from __future__ import annotations

import struct


class ZstdError(ValueError):
    pass


def _highbit(x: int) -> int:
    return x.bit_length() - 1


# ---------------------------------------------------------------------------
# bitstreams
# ---------------------------------------------------------------------------


class _FwdBits:
    """Forward little-endian bitstream (FSE table descriptions,
    RFC 8878 §4.1.1): values are read LSB-first from each byte."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            byte = self.data[(self.pos + i) >> 3]
            out |= ((byte >> ((self.pos + i) & 7)) & 1) << i
        self.pos += n
        return out

    def rewind(self, n: int) -> None:
        self.pos -= n

    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3


class _BackBits:
    """Backward bitstream (Huffman + FSE decoding streams, §3.1.1.7):
    the stream is written forward but read from the end; the last byte
    carries a 1-bit start marker above the padding. Reading past the
    start yields zero bits with `remaining` going negative — callers
    check `remaining` like the reference decoders do.

    Reads extract a ≤(n+7)/8+1-byte window at the bit offset instead
    of shifting one whole-stream Python int: the big-int approach made
    every read O(stream bytes) — quadratic over a 128 KB block — while
    the window is O(1) per read regardless of block size."""

    def __init__(self, data: bytes):
        if not data:
            raise ZstdError("empty backward bitstream")
        if data[-1] == 0:
            raise ZstdError("backward bitstream: missing start marker")
        self.data = data
        # strip the marker bit: total bits below it are readable
        self.remaining = 8 * len(data) - (8 - _highbit(data[-1]))

    def read(self, n: int) -> int:
        self.remaining -= n
        r = self.remaining
        if n == 0:
            return 0
        data = self.data
        if r >= 0:
            lo = r >> 3
            off = r & 7
            chunk = int.from_bytes(
                data[lo: lo + ((n + off + 7) >> 3)], "little")
            return (chunk >> off) & ((1 << n) - 1)
        # past the start: zero-pad low bits (only reachable in the
        # final, discarded state update — see interleaved FSE loops)
        avail = r + n
        if avail <= 0:
            return 0
        chunk = int.from_bytes(data[: (avail + 7) >> 3], "little")
        return (chunk & ((1 << avail) - 1)) << (-r)


# ---------------------------------------------------------------------------
# FSE (tANS) — §4.1
# ---------------------------------------------------------------------------


class _FseTable:
    __slots__ = ("symbols", "num_bits", "new_state", "accuracy_log")

    def __init__(self, symbols, num_bits, new_state, accuracy_log):
        self.symbols = symbols
        self.num_bits = num_bits
        self.new_state = new_state
        self.accuracy_log = accuracy_log


def fse_build_table(freqs: list[int], accuracy_log: int) -> _FseTable:
    """Decode-table construction from normalized frequencies
    (§4.1.1): -1 slots fill from the table end; positive counts spread
    with step = 5/8·size + 3; per-cell nbBits/baseline from the
    per-symbol running counter."""
    size = 1 << accuracy_log
    symbols = [0] * size
    high_threshold = size
    state_desc = [0] * len(freqs)
    for s, f in enumerate(freqs):
        if f == -1:
            high_threshold -= 1
            symbols[high_threshold] = s
            state_desc[s] = 1
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    pos = 0
    for s, f in enumerate(freqs):
        if f <= 0:
            continue
        state_desc[s] = f
        for _ in range(f):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos >= high_threshold:
                pos = (pos + step) & mask
    if pos != 0:
        raise ZstdError("FSE table spread did not return to origin")
    num_bits = [0] * size
    new_state = [0] * size
    for i in range(size):
        s = symbols[i]
        nx = state_desc[s]
        state_desc[s] += 1
        nb = accuracy_log - _highbit(nx)
        num_bits[i] = nb
        new_state[i] = (nx << nb) - size
    return _FseTable(symbols, num_bits, new_state, accuracy_log)


def fse_read_table(data: bytes, max_accuracy_log: int) -> tuple[_FseTable, int]:
    """Parse an FSE table description (§4.1.1); returns (table,
    bytes consumed)."""
    bits = _FwdBits(data)
    accuracy_log = 5 + bits.read(4)
    if accuracy_log > max_accuracy_log:
        raise ZstdError(f"FSE accuracy log {accuracy_log} over limit "
                        f"{max_accuracy_log}")
    remaining = 1 << accuracy_log
    freqs: list[int] = []
    while remaining > 0 and len(freqs) < 256:
        nbits = _highbit(remaining + 1) + 1
        val = bits.read(nbits)
        lower_mask = (1 << (nbits - 1)) - 1
        threshold = (1 << nbits) - 1 - (remaining + 1)
        if (val & lower_mask) < threshold:
            bits.rewind(1)
            val &= lower_mask
        elif val > lower_mask:
            val -= threshold
        proba = val - 1
        remaining -= -proba if proba < 0 else proba
        freqs.append(proba)
        if proba == 0:
            while True:
                repeat = bits.read(2)
                freqs.extend([0] * repeat)
                if repeat != 3:
                    break
    if remaining != 0:
        raise ZstdError("FSE frequencies do not sum to table size")
    return fse_build_table(freqs, accuracy_log), bits.bytes_consumed()


def _fse_init(table: _FseTable, stream: _BackBits) -> int:
    return stream.read(table.accuracy_log)


def _fse_peek(table: _FseTable, state: int) -> int:
    return table.symbols[state]


def _fse_update(table: _FseTable, state: int, stream: _BackBits) -> int:
    return table.new_state[state] + stream.read(table.num_bits[state])


# ---------------------------------------------------------------------------
# Huffman literals — §4.2
# ---------------------------------------------------------------------------


class _HufTable:
    __slots__ = ("symbols", "num_bits", "max_bits")

    def __init__(self, symbols, num_bits, max_bits):
        self.symbols = symbols
        self.num_bits = num_bits
        self.max_bits = max_bits


def _huf_from_weights(weights: list[int]) -> _HufTable:
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ZstdError("Huffman weights are all zero")
    max_bits = _highbit(total) + 1
    left = (1 << max_bits) - total
    if left & (left - 1):
        raise ZstdError("Huffman implied weight is not a power of two")
    weights = weights + [_highbit(left) + 1]
    bits = [max_bits + 1 - w if w > 0 else 0 for w in weights]
    size = 1 << max_bits
    symbols = bytearray(size)
    num_bits = bytearray(size)
    rank_count = [0] * (max_bits + 1)
    for b in bits:
        rank_count[b] += 1
    rank_idx = [0] * (max_bits + 2)
    rank_idx[max_bits] = 0
    for i in range(max_bits, 0, -1):
        rank_idx[i - 1] = rank_idx[i] + rank_count[i] * (1 << (max_bits - i))
    for sym, b in enumerate(bits):
        if b == 0:
            continue
        code = rank_idx[b]
        length = 1 << (max_bits - b)
        for j in range(code, code + length):
            symbols[j] = sym
            num_bits[j] = b
        rank_idx[b] += length
    return _HufTable(symbols, num_bits, max_bits)


def _huf_read_table(data: bytes) -> tuple[_HufTable, int]:
    """Huffman tree description (§4.2.1): header byte >= 128 → direct
    4-bit weights; < 128 → FSE-compressed weight stream (two
    interleaved states, accuracy ≤ 6)."""
    header = data[0]
    if header >= 128:
        num = header - 127
        weights = []
        for i in range(num):
            b = data[1 + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        consumed = 1 + (num + 1) // 2
        return _huf_from_weights(weights), consumed
    comp = data[1: 1 + header]
    table, used = fse_read_table(comp, 6)
    stream = _BackBits(comp[used:])
    s1 = _fse_init(table, stream)
    s2 = _fse_init(table, stream)
    weights: list[int] = []
    while True:
        weights.append(_fse_peek(table, s1))
        s1 = _fse_update(table, s1, stream)
        if stream.remaining < 0:
            weights.append(_fse_peek(table, s2))
            break
        weights.append(_fse_peek(table, s2))
        s2 = _fse_update(table, s2, stream)
        if stream.remaining < 0:
            weights.append(_fse_peek(table, s1))
            break
        if len(weights) > 255:
            raise ZstdError("Huffman weight stream overflow")
    return _huf_from_weights(weights), 1 + header


def _huf_decode_stream(table: _HufTable, data: bytes, out_len: int) -> bytearray:
    stream = _BackBits(data)
    out = bytearray()
    mask = (1 << table.max_bits) - 1
    remaining = stream.remaining
    symbols, num_bits, max_bits = table.symbols, table.num_bits, table.max_bits
    for _ in range(out_len):
        # peek max_bits at the current bit offset via a byte window
        # (same O(1) trick as _BackBits.read)
        base = remaining - max_bits
        if base >= 0:
            lo = base >> 3
            off = base & 7
            chunk = int.from_bytes(
                data[lo: lo + ((max_bits + off + 7) >> 3)], "little")
            idx = (chunk >> off) & mask
        elif remaining > 0:
            chunk = int.from_bytes(data[: (remaining + 7) >> 3], "little")
            idx = ((chunk & ((1 << remaining) - 1)) << (max_bits - remaining)) & mask
        else:
            idx = 0
        nb = num_bits[idx]
        if nb == 0:
            raise ZstdError("Huffman stream hit an unassigned code")
        out.append(symbols[idx])
        remaining -= nb
        if remaining < 0:
            raise ZstdError("Huffman stream exhausted early")
    if remaining != 0:
        raise ZstdError("Huffman stream has trailing bits")
    return out


# ---------------------------------------------------------------------------
# sequences — §3.1.1.3.2
# ---------------------------------------------------------------------------

# predefined distributions + baselines (§3.1.1.3.2.2)
_LL_DEFAULTS = [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
                2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
                -1, -1, -1, -1]
_ML_DEFAULTS = [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
                -1, -1, -1, -1, -1]
_OF_DEFAULTS = [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1]

_LL_BASE = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
            16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512,
            1024, 2048, 4096, 8192, 16384, 32768, 65536]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10,
                       11, 12, 13, 14, 15, 16]
_ML_BASE = [3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
            19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
            33, 34, 35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131,
            259, 515, 1027, 2051, 4099, 8195, 16387, 32771, 65539]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10,
                       11, 12, 13, 14, 15, 16]

_PREDEFINED = {
    "ll": (None, _LL_DEFAULTS, 6, 35),
    "of": (None, _OF_DEFAULTS, 5, 31),
    "ml": (None, _ML_DEFAULTS, 6, 52),
}
_MAX_ACC = {"ll": 9, "of": 8, "ml": 9}


class _SeqTables:
    """Per-frame sequence decoding context: the three FSE tables plus
    repeat-offset history survive across blocks (§3.1.1.2)."""

    def __init__(self):
        self.tables: dict[str, _FseTable | tuple] = {}
        self.rep = [1, 4, 8]

    def read_mode(self, kind: str, mode: int, data: bytes, off: int) -> int:
        if mode == 0:  # predefined
            _, dist, acc, _ = _PREDEFINED[kind]
            self.tables[kind] = fse_build_table(dist, acc)
            return off
        if mode == 1:  # RLE: one byte symbol
            self.tables[kind] = ("rle", data[off])
            return off + 1
        if mode == 2:  # FSE-compressed
            table, used = fse_read_table(data[off:], _MAX_ACC[kind])
            self.tables[kind] = table
            return off + used
        if kind not in self.tables:  # mode 3: repeat
            raise ZstdError(f"repeat mode for {kind} with no previous table")
        return off


class _SeqState:
    __slots__ = ("table", "state", "rle")

    def __init__(self, table, stream: _BackBits):
        if isinstance(table, tuple):  # ("rle", symbol)
            self.rle = table[1]
            self.table = None
            self.state = 0
        else:
            self.rle = None
            self.table = table
            self.state = _fse_init(table, stream)

    def symbol(self) -> int:
        if self.rle is not None:
            return self.rle
        return _fse_peek(self.table, self.state)

    def update(self, stream: _BackBits) -> None:
        if self.rle is None:
            self.state = _fse_update(self.table, self.state, stream)


def _decode_sequences(data: bytes, ctx: _SeqTables) -> list[tuple[int, int, int]]:
    """Returns [(literal_length, offset, match_length), ...]; data is
    the sequences section of one block."""
    if not data:
        raise ZstdError("empty sequences section")
    b0 = data[0]
    if b0 == 0:
        return []
    if b0 < 128:
        nseq, off = b0, 1
    elif b0 < 255:
        nseq, off = ((b0 - 128) << 8) | data[1], 2
    else:
        # RFC 8878 §3.1.1.3.2.1: byte0==255 → nseq = LE16(byte1,byte2)
        # + 0x7F00 — an ADDITION (values ≥ 32512 carry into the high
        # bits), not a bitwise OR
        nseq, off = (data[1] | (data[2] << 8)) + 0x7F00, 3
    modes = data[off]
    off += 1
    if modes & 0x03:
        raise ZstdError("reserved sequence compression mode bits set")
    off = ctx.read_mode("ll", (modes >> 6) & 3, data, off)
    off = ctx.read_mode("of", (modes >> 4) & 3, data, off)
    off = ctx.read_mode("ml", (modes >> 2) & 3, data, off)
    stream = _BackBits(data[off:])
    ll_s = _SeqState(ctx.tables["ll"], stream)
    of_s = _SeqState(ctx.tables["of"], stream)
    ml_s = _SeqState(ctx.tables["ml"], stream)
    out = []
    rep = ctx.rep
    for i in range(nseq):
        of_code = of_s.symbol()
        if of_code > 31:
            raise ZstdError("offset code over 31")
        offset_value = (1 << of_code) + stream.read(of_code)
        ml_code = ml_s.symbol()
        ml = _ML_BASE[ml_code] + stream.read(_ML_BITS[ml_code])
        ll_code = ll_s.symbol()
        ll = _LL_BASE[ll_code] + stream.read(_LL_BITS[ll_code])
        if stream.remaining < 0:
            raise ZstdError("sequences bitstream exhausted")
        # repeat offsets (§3.1.1.5)
        if offset_value > 3:
            offset = offset_value - 3
            rep[2] = rep[1]
            rep[1] = rep[0]
            rep[0] = offset
        else:
            idx = offset_value - 1 + (1 if ll == 0 else 0)
            if idx == 0:
                offset = rep[0]
            else:
                offset = rep[idx] if idx < 3 else rep[0] - 1
                if offset == 0:
                    raise ZstdError("zero repeat offset")
                if idx > 1:
                    rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
        out.append((ll, offset, ml))
        if i < nseq - 1:
            ll_s.update(stream)
            ml_s.update(stream)
            of_s.update(stream)
    return out


# ---------------------------------------------------------------------------
# literals section — §3.1.1.3.1
# ---------------------------------------------------------------------------


class _LitCtx:
    """Huffman table persists across blocks for Treeless mode."""

    def __init__(self):
        self.table: _HufTable | None = None


def _decode_literals(data: bytes, ctx: _LitCtx) -> tuple[bytes, int]:
    """Returns (literals, bytes consumed from `data`)."""
    b0 = data[0]
    ltype = b0 & 3
    size_format = (b0 >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if size_format in (0, 2):
            regen = b0 >> 3
            off = 1
        elif size_format == 1:
            regen = (b0 >> 4) | (data[1] << 4)
            off = 2
        else:
            regen = (b0 >> 4) | (data[1] << 4) | (data[2] << 12)
            off = 3
        if ltype == 0:
            return bytes(data[off: off + regen]), off + regen
        return bytes([data[off]]) * regen, off + 1
    # compressed (2) / treeless (3)
    if size_format == 0:
        regen = (b0 >> 4) | ((data[1] & 0x3F) << 4)
        comp = (data[1] >> 6) | (data[2] << 2)
        off, streams = 3, 1
    elif size_format == 1:
        regen = (b0 >> 4) | ((data[1] & 0x3F) << 4)
        comp = (data[1] >> 6) | (data[2] << 2)
        off, streams = 3, 4
    elif size_format == 2:
        regen = (b0 >> 4) | (data[1] << 4) | ((data[2] & 3) << 12)
        comp = (data[2] >> 2) | (data[3] << 6)
        off, streams = 4, 4
    else:
        regen = (b0 >> 4) | (data[1] << 4) | ((data[2] & 0x3F) << 12)
        comp = (data[2] >> 6) | (data[3] << 2) | (data[4] << 10)
        off, streams = 5, 4
    section = data[off: off + comp]
    total = off + comp
    if ltype == 2:
        table, used = _huf_read_table(section)
        ctx.table = table
        section = section[used:]
    elif ctx.table is None:
        raise ZstdError("treeless literals with no previous Huffman table")
    table = ctx.table
    if streams == 1:
        return bytes(_huf_decode_stream(table, section, regen)), total
    if len(section) < 6:
        raise ZstdError("4-stream literals too short for jump table")
    s1, s2, s3 = struct.unpack_from("<HHH", section, 0)
    body = section[6:]
    if s1 + s2 + s3 > len(body):
        raise ZstdError("4-stream jump table exceeds section")
    part = (regen + 3) // 4
    out = bytearray()
    chunks = (body[:s1], body[s1:s1 + s2], body[s1 + s2:s1 + s2 + s3],
              body[s1 + s2 + s3:])
    for i, chunk in enumerate(chunks):
        want = part if i < 3 else regen - 3 * part
        out += _huf_decode_stream(table, chunk, want)
    return bytes(out), total


# ---------------------------------------------------------------------------
# frames & blocks — §3.1
# ---------------------------------------------------------------------------

_MAGIC = 0xFD2FB528
_SKIP_LO, _SKIP_HI = 0x184D2A50, 0x184D2A5F


def _decode_block(data: bytes, out: bytearray, lit_ctx: _LitCtx,
                  seq_ctx: _SeqTables) -> None:
    literals, used = _decode_literals(data, lit_ctx)
    seqs = _decode_sequences(data[used:], seq_ctx)
    lpos = 0
    for ll, offset, ml in seqs:
        out += literals[lpos: lpos + ll]
        lpos += ll
        if offset > len(out):
            raise ZstdError("match offset before window start")
        start = len(out) - offset
        if offset >= ml:
            out += out[start: start + ml]
        else:  # overlap: byte-forward copy == tiling the period
            seg = bytes(out[start: start + offset])
            out += (seg * (ml // offset + 1))[:ml]
    out += literals[lpos:]


def decompress(data: bytes, max_output: int = 1 << 31) -> bytes:
    """Decode all zstd frames in `data`, concatenated (the frame
    container semantics of `zstd -d`). Corrupt/truncated input raises
    ZstdError — never a bare IndexError (fuzz-enforced)."""
    try:
        return _decompress_frames(data, max_output)
    except (IndexError, struct.error) as e:
        raise ZstdError(f"truncated or corrupt zstd stream: {e}") from e


def _decompress_frames(data: bytes, max_output: int) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if n - pos < 4:
            raise ZstdError("truncated frame magic")
        magic = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        if _SKIP_LO <= magic <= _SKIP_HI:
            size = struct.unpack_from("<I", data, pos)[0]
            pos += 4 + size
            continue
        if magic != _MAGIC:
            raise ZstdError(f"bad zstd magic 0x{magic:08x}")
        fhd = data[pos]
        pos += 1
        fcs_flag = fhd >> 6
        single_segment = (fhd >> 5) & 1
        checksum = (fhd >> 2) & 1
        did_flag = fhd & 3
        if (fhd >> 3) & 1:
            raise ZstdError("reserved frame header bit set")
        if not single_segment:
            pos += 1  # window descriptor: informational for a buffer decode
        did_bytes = (0, 1, 2, 4)[did_flag]
        if did_bytes:
            did = int.from_bytes(data[pos: pos + did_bytes], "little")
            pos += did_bytes
            if did:
                raise ZstdError("dictionaries are not supported")
        fcs_bytes = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
        content_size = None
        if fcs_bytes:
            content_size = int.from_bytes(data[pos: pos + fcs_bytes], "little")
            if fcs_bytes == 2:
                content_size += 256
            pos += fcs_bytes
        if content_size is not None and content_size > max_output:
            raise ZstdError(f"declared content size {content_size} over cap")
        frame_start = len(out)
        lit_ctx = _LitCtx()
        seq_ctx = _SeqTables()
        while True:
            bh = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == 0:  # raw
                out += data[pos: pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE
                out += bytes([data[pos]]) * bsize
                pos += 1
            elif btype == 2:
                _decode_block(data[pos: pos + bsize], out, lit_ctx, seq_ctx)
                pos += bsize
            else:
                raise ZstdError("reserved block type")
            if len(out) - frame_start > max_output:
                raise ZstdError("output exceeds cap")
            if last:
                break
        if checksum:
            pos += 4  # xxhash64 low bytes: skipped, not verified
        if content_size is not None and len(out) - frame_start != content_size:
            raise ZstdError(
                f"frame decoded {len(out) - frame_start} bytes, "
                f"declared {content_size}")
    return bytes(out)
