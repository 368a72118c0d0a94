"""Baseline JPEG codec (operators/jpeg.py) — round trips through the
matching encoder, pixel parity against Java ImageIO (the independent
decoder Spark ships) on real photos, restart markers, grayscale, and
the loud-fail surfaces (progressive, truncation, garbage)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from syslog_ng_spark.operators.jpeg import (
    JpegError,
    decode_jpeg,
    make_jpeg,
)

KITTENS = sorted(glob.glob(
    "/opt/spark-*/data/mllib/images/origin/kittens/*.jpg"))
PROGRESSIVE = [p for p in glob.glob("/usr/share/doc/nodejs/*.jpg")
               if os.path.exists(p)]


def gradient(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        xx * 255 // w, yy * 255 // h, (xx + yy) * 255 // (h + w)
    ], axis=-1).astype(np.uint8)


@pytest.mark.parametrize("quality,max_err", [(70, 12), (90, 6), (95, 4)])
def test_round_trip_rgb(quality, max_err):
    img = gradient()
    dec = decode_jpeg(make_jpeg(img, quality=quality))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 2.0
    assert err.max() <= max_err


def test_round_trip_grayscale_and_odd_dims():
    # 41x53: exercises edge-block padding on both axes
    yy, xx = np.mgrid[0:41, 0:53]
    g = ((xx * 4 + yy * 3) % 256).astype(np.uint8)
    dec = decode_jpeg(make_jpeg(g, quality=95))
    assert dec.shape == g.shape
    assert np.abs(dec.astype(int) - g.astype(int)).mean() < 2.0


def test_round_trip_noise_bounded():
    rng = np.random.default_rng(7)
    n = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    dec = decode_jpeg(make_jpeg(n, quality=95))
    err = np.abs(dec.astype(int) - n.astype(int))
    assert err.mean() < 6 and err.max() < 48  # worst-case content


def test_restart_markers_round_trip():
    """DRI + RSTn path: interval 2 forces a restart every other MCU,
    incl. DC predictor resets and stuffed-pad handling before markers."""
    img = gradient(24, 80)  # 3x10 MCUs -> 14 restarts
    enc = make_jpeg(img, quality=90, restart_interval=2)
    assert b"\xff\xdd" in enc and b"\xff\xd0" in enc
    plain = decode_jpeg(make_jpeg(img, quality=90))
    restarted = decode_jpeg(enc)
    assert np.array_equal(plain, restarted)  # same pixels either way


@pytest.mark.skipif(not KITTENS, reason="Spark sample images not present")
def test_pixel_parity_with_java_imageio(spark):
    """The independent-oracle test: decode the Spark-shipped photos
    (baseline SOF0, 4:2:0) with Java ImageIO via the image data source
    AND with this decoder — per-sample agreement within the expected
    integer-IDCT-vs-float envelope (mean ~1, p99 <= 4, max <= 16)."""
    rows = (
        spark.read.format("image")
        .load(os.path.dirname(KITTENS[0]))
        .select("image.*")
        .collect()
    )
    checked = 0
    for r in rows:
        if r.nChannels != 3:
            continue
        theirs = np.frombuffer(bytes(r.data), dtype=np.uint8).reshape(
            r.height, r.width, 3)[:, :, ::-1]  # BGR -> RGB
        path = r.origin.replace("file:", "")
        mine = decode_jpeg(open(path, "rb").read())
        assert mine.shape == theirs.shape
        d = np.abs(mine.astype(int) - theirs.astype(int))
        assert d.mean() < 1.6, (path, d.mean())
        assert np.percentile(d, 99) <= 4, path
        assert d.max() <= 16, (path, d.max())
        checked += 1
    assert checked >= 3


GRAYSCALE_PROG = glob.glob(
    "/opt/spark-*/data/mllib/images/origin/multi-channel/grayscale.jpg")


@pytest.mark.skipif(not PROGRESSIVE, reason="no progressive sample")
def test_progressive_pixel_parity_with_java_imageio(spark):
    """Progressive (SOF2) decoding against the same independent
    oracle: the OS-shipped multi-scan 4:4:4 files (spectral selection
    + successive approximation + AC refinement EOB runs) agree with
    Java ImageIO within +-2 per sample — tighter than baseline since
    4:4:4 skips the upsampling difference entirely."""
    import numpy as np

    for path in PROGRESSIVE:
        r = (spark.read.format("image").load(path)
             .select("image.*").collect())[0]
        theirs = np.frombuffer(bytes(r.data), dtype=np.uint8).reshape(
            r.height, r.width, 3)[:, :, ::-1]
        mine = decode_jpeg(open(path, "rb").read())
        d = np.abs(mine.astype(int) - theirs.astype(int))
        assert d.mean() < 0.5 and d.max() <= 4, (path, d.mean(), d.max())


@pytest.mark.skipif(not GRAYSCALE_PROG, reason="no grayscale sample")
def test_progressive_grayscale_parity(spark):
    import numpy as np

    path = GRAYSCALE_PROG[0]
    r = (spark.read.format("image").load(path)
         .select("image.*").collect())[0]
    arr = np.frombuffer(bytes(r.data), dtype=np.uint8)
    theirs = arr.reshape(r.height, r.width, r.nChannels)[..., 0]
    mine = decode_jpeg(open(path, "rb").read())
    assert mine.ndim == 2
    d = np.abs(mine.astype(int) - theirs.astype(int))
    assert d.mean() < 0.5 and d.max() <= 2


def test_unsupported_sof_fails_loudly():
    # hand-built SOF3 (lossless) header after SOI
    import struct as _s

    bogus = (b"\xff\xd8" + b"\xff\xc3" +
             _s.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(bogus)


def test_error_surfaces():
    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")
    good = make_jpeg(gradient(16, 16))
    with pytest.raises(JpegError):
        decode_jpeg(good[:40])          # truncated in the headers
    with pytest.raises(JpegError):
        decode_jpeg(good[:-30])         # truncated entropy stream


def test_fuzz_corrupt_jpeg_always_raises_jpeg_error():
    """Crash-freedom: mutated real streams and raw random bytes raise
    JpegError/NotImplementedError, never bare IndexError/KeyError/
    struct.error (found-by-fuzz classes baked in)."""
    import random

    rng = random.Random(99)
    good = make_jpeg(gradient(16, 16))
    for trial in range(600):
        if trial % 2:
            b = bytearray(good)
            for _ in range(rng.randint(1, 10)):
                op = rng.randrange(3)
                if op == 0 and b:
                    b[rng.randrange(len(b))] = rng.randrange(256)
                elif op == 1 and len(b) > 10:
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
            decode_jpeg(payload)
        except (JpegError, NotImplementedError):
            pass


def test_image_pixel_stats_sniffs_both_containers(spark):
    """The pipeline entry: a media frame mixing PNG and JPEG payloads
    decodes per container; JPEG stats match the source pixels within
    quantization error."""
    import pandas as pd

    from syslog_ng_spark.operators.multimodal import image_pixel_stats, make_png

    img = gradient(16, 16)
    pdf = pd.DataFrame({
        "media_id": [1, 2],
        "payload": [make_png(img), make_jpeg(img, quality=95)],
    })
    df = spark.createDataFrame(pdf)
    rows = {r["media_id"]: r for r in image_pixel_stats(df).collect()}
    assert rows[1]["width"] == rows[2]["width"] == 16
    for ch in range(3):
        assert abs(rows[1]["mean"][ch] - rows[2]["mean"][ch]) < 2.0


def test_multiscan_baseline_round_trip():
    """T.81-legal multi-scan sequential baseline (components split
    across scans, B.2.3): decodes via the coefficient-store path and
    matches the interleaved single-scan encoding of the same image
    EXACTLY (same coefficients, same IDCT — only scan order differs)."""
    img = gradient(48, 64)
    single = decode_jpeg(make_jpeg(img, quality=90))
    multi = decode_jpeg(make_jpeg(img, quality=90, scan_split=True))
    assert multi.shape == single.shape
    assert np.array_equal(multi, single)


def test_multiscan_baseline_with_restarts():
    img = gradient(40, 40)
    single = decode_jpeg(make_jpeg(img, quality=85))
    multi = decode_jpeg(make_jpeg(img, quality=85, scan_split=True,
                                  restart_interval=7))
    assert np.array_equal(multi, single)


def test_multiscan_baseline_missing_component_fails_loudly():
    img = gradient(24, 24)
    data = make_jpeg(img, quality=85, scan_split=True)
    # truncate after the second scan's entropy data: drop the last SOS
    last_sos = data.rfind(b"\xff\xda")
    truncated = data[:last_sos] + b"\xff\xd9"
    with pytest.raises(JpegError, match="component"):
        decode_jpeg(truncated)


def test_bitreader_segment_semantics():
    """r14 reader rewrite pins: MSB-first bit order across a stuffed
    0xFF00, `pos` = source offset of the next unconsumed byte (align
    included), _MarkerHit carries the marker's source position, and
    reading past end-of-data raises IndexError like the old
    data[pos + 1] fill path."""
    from syslog_ng_spark.operators.jpeg import _BitReader, _MarkerHit

    # payload: A5, stuffed FF(00), 3C, then a RST4 marker, then junk
    data = bytes([0xA5, 0xFF, 0x00, 0x3C, 0xFF, 0xD4, 0x99])
    r = _BitReader(data, 0)
    assert r.bits(8) == 0xA5
    assert r.pos == 1  # next unconsumed byte is the stuffed 0xFF at 1
    assert r.bits(12) == 0xFF3  # crosses the unstuffed 0xFF boundary
    r.align()  # drops the low nibble of 0x3C
    assert r.pos == 4  # the marker's 0xFF
    try:
        r.bit()
        raise AssertionError("expected _MarkerHit")
    except _MarkerHit as mh:
        assert mh.pos == 4
    # re-segment past the marker (the RSTn dance)
    r.pos = 6
    assert r.bits(8) == 0x99
    try:
        r.bit()
        raise AssertionError("expected IndexError at end of data")
    except IndexError:
        pass
