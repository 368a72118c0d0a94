from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from syslog_ng_spark.operators import multimodal, textstats


def test_text_stats_columns(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog in a field of grass with a stream")],
        "doc_id long, text string",
    )
    row = textstats.text_stats(df).collect()[0]
    assert row.n_tokens == 16
    assert 0.2 <= row.stopword_ratio <= 0.5
    assert row.quality > 0.5
    assert len(row.fingerprint) == 16


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is of note"),
            (2, "le chat et la mer est grande"),
            (3, "der hund und die katze ist hier"),
            (4, "xyz qwerty asdf"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.lang for r in df.select("doc_id", textstats.lang_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "fr", 3: "de", 4: "und"}


def test_multimodal_features(spark):
    media = multimodal.synthetic_media(spark, n=12)
    feats = multimodal.extract_features(media, dim=8).collect()
    assert len(feats) == 12
    assert all(len(r.feat) == 8 for r in feats)
    assert all(0.0 <= x <= 1.0 for r in feats for x in r.feat)
    # deterministic: same payload → same features
    again = multimodal.extract_features(multimodal.synthetic_media(spark, n=12), dim=8).collect()
    assert {r.media_id: list(r.feat) for r in feats} == {r.media_id: list(r.feat) for r in again}


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal._real_decode_unavailable(b"bytes")


def test_frame_sample_plan(spark):
    media = multimodal.synthetic_media(spark, n=6)
    plan = multimodal.frame_sample_plan(media, every_n=10)
    rows = plan.collect()
    assert all(r.frame_idx % 10 == 0 for r in rows)


def test_audio_window_features_values(spark):
    import numpy as np

    from syslog_ng_spark.operators.multimodal import audio_window_features

    payload = bytes(range(200))  # deterministic ramp
    df = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    rows = {r.win_idx: r for r in audio_window_features(df, window=64, hop=32).collect()}
    # (200 - 64) // 32 + 1 = 5 windows
    assert sorted(rows) == [0, 1, 2, 3, 4]
    x = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    seg = x[0:64] - 128.0
    assert rows[0].rms == round(float(np.sqrt(np.mean(seg ** 2))), 6)
    assert 0.0 <= rows[0].zcr <= 1.0
    # short payloads produce no windows, not an error
    tiny = spark.createDataFrame([(2, bytearray(b"abc"))], "media_id long, payload binary")
    assert audio_window_features(tiny, window=64, hop=32).count() == 0


def test_image_tile_plan_counts(spark):
    from syslog_ng_spark.operators.multimodal import image_tile_plan

    df = spark.createDataFrame(
        [(1, 500, 300), (2, 224, 224), (3, 10, 10)],
        "media_id long, width int, height int",
    )
    out = image_tile_plan(df, tile=224).groupBy("media_id").count().collect()
    got = {r.media_id: r["count"] for r in out}
    assert got == {1: 3 * 2, 2: 1, 3: 1}


def test_hashed_bow_topk_ranks_near_dup_first(spark):
    from syslog_ng_spark.operators import textstats

    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 0
        (2, "completely different text about spark query engines and shuffles"),
        (3, "the quick brown fox"),                                              # partial overlap
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = textstats.hashed_bow_topk(docs, query_id=0, k=3).collect()
    assert [r.doc_id for r in got][0] == 1          # near-dup ranks first
    assert got[0].cos_sim > got[-1].cos_sim
    # integer weights: rerun is bit-identical
    again = textstats.hashed_bow_topk(docs, query_id=0, k=3).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]


def test_dsir_logweight_favors_target_like_docs(spark):
    """Docs written in the target's vocabulary must score higher than
    docs from a disjoint vocabulary; weights of target-vocab docs are
    positive, alien-vocab docs negative (their features are missing
    from the target distribution)."""
    from syslog_ng_spark.operators.textstats import dsir_logweight

    target = spark.createDataFrame(
        [(100 + i, "physics energy quantum field theory wave") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "physics energy quantum wave field"),
            (2, "football goal striker penalty referee"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.logw for r in dsir_logweight(raw, target, dim=256).collect()}
    assert out[1] > 0 > out[2]
    assert out[1] > out[2] + 5  # clearly separated, not noise


def test_bigram_logprob_penalizes_shuffled_text(spark):
    """The bigram score separates natural repetition from shuffled
    word salad with the SAME token histogram — the property the
    unigram score cannot see."""
    from syslog_ng_spark.operators.textstats import bigram_logprob

    natural = ("the cat sat on the mat " * 10).strip()
    # same tokens, transitions scrambled; the corpus is dominated by
    # the natural transition structure (the model is corpus-trained,
    # so a 50/50 corpus would train both patterns in equally)
    shuffled = ("cat the mat sat the on " * 10).strip()
    rows = [(i, natural) for i in range(1, 6)] + [(6, shuffled)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_logprob(df).collect()}
    assert out[1].n_bigrams == out[6].n_bigrams
    assert out[1].neg_logprob < out[6].neg_logprob


def test_bigram_logprob_short_docs_drop(spark):
    from syslog_ng_spark.operators.textstats import bigram_logprob

    df = spark.createDataFrame(
        [(1, "single"), (2, "two tokens")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in bigram_logprob(df).collect()}
    assert 1 not in out and out[2].n_bigrams == 1


def test_vocab_growth_curve_monotone_and_counts(spark):
    """Cumulative types/tokens are monotone; the final bucket's
    cum_types equals the corpus distinct-token count and cum_tokens
    the corpus token count."""
    from syslog_ng_spark.operators.textstats import tokens, vocab_growth
    from pyspark.sql import functions as F

    rows = [
        (0, "alpha beta gamma"),
        (3, "alpha beta"),
        (5, "delta alpha"),
        (9, "epsilon zeta delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = vocab_growth(df, buckets=4).orderBy("bucket").collect()
    assert [r.bucket for r in out] == [0, 1, 2, 3]
    for a, b in zip(out, out[1:]):
        assert b.cum_tokens >= a.cum_tokens and b.cum_types >= a.cum_types
    toks = df.select(F.explode(tokens(F.col("text"))).alias("t"))
    assert out[-1].cum_tokens == toks.count()
    assert out[-1].cum_types == toks.distinct().count()
    # repeated 'alpha' in later buckets adds tokens, not types
    assert out[1].cum_types == out[0].cum_types + 0  # bucket 1 = doc 3: alpha,beta seen


def test_wav_roundtrip_all_widths():
    """make_wav -> decode_wav recovers the samples for every PCM width
    the decoder claims (8-bit unsigned, 16/24/32-bit signed LE)."""
    import numpy as np

    from syslog_ng_spark.operators.multimodal import decode_wav, make_wav

    rng = np.random.default_rng(7)
    f = rng.uniform(-0.99, 0.99, size=128)
    cases = [
        (1, ((f * 128) + 128).astype(np.uint8).tobytes(), 1 / 128.0),
        (2, (f * 32768).astype("<i2").tobytes(), 1 / 32768.0),
        (4, (f * 2147483648).astype("<i4").tobytes(), 1 / 2147483648.0),
    ]
    # 24-bit: pack int32 samples into 3 LE bytes each
    i24 = (f * 8388608).astype(np.int32)
    b24 = np.zeros((len(i24), 3), dtype=np.uint8)
    b24[:, 0] = i24 & 0xFF
    b24[:, 1] = (i24 >> 8) & 0xFF
    b24[:, 2] = (i24 >> 16) & 0xFF
    cases.append((3, b24.tobytes(), 1 / 8388608.0))
    for width, pcm, step in cases:
        wav = make_wav(pcm, sample_rate=16000, sampwidth=width)
        x, rate = decode_wav(wav)
        assert rate == 16000
        assert len(x) == 128
        assert np.max(np.abs(x - f)) <= step, f"width {width}"


def test_wav_stereo_averages_to_mono():
    import numpy as np

    from syslog_ng_spark.operators.multimodal import decode_wav, make_wav

    left = np.full(32, 1000, dtype="<i2")
    right = np.full(32, 3000, dtype="<i2")
    inter = np.empty(64, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    x, _ = decode_wav(make_wav(inter.tobytes(), sampwidth=2, channels=2))
    assert len(x) == 32
    assert np.allclose(x, 2000 / 32768.0)


def test_wav_lossy_loud_fail():
    import pytest

    from syslog_ng_spark.operators.multimodal import decode_wav

    with pytest.raises(NotImplementedError, match="PCM WAV"):
        decode_wav(b"ID3\x04\x00mp3-ish garbage that is not RIFF")


def test_wav_truncated_riff_loud_fail():
    """Truncated / garbage RIFF payloads raise EOFError or struct.error
    from inside `wave`'s chunk walker — those must hit the same
    documented NotImplementedError contract, not escape raw."""
    import pytest

    from syslog_ng_spark.operators.multimodal import decode_wav, make_wav

    good = make_wav(bytes(range(64)), sampwidth=1)
    for payload in (
        good[:10],                     # RIFF header cut short
        good[:20],                     # fmt chunk cut short
        b"RIFF\x24\x00\x00\x00WAVE",   # no chunks at all
    ):
        with pytest.raises(NotImplementedError, match="PCM WAV"):
            decode_wav(payload)


def test_audio_window_features_wav_container(spark):
    """container='wav' end-to-end equals the raw-u8 path on the same
    bytes: ZCR identical, RMS scaled by the u8 normalization (1/128)."""
    from syslog_ng_spark.operators.multimodal import (
        audio_window_features,
        make_wav,
    )

    payload = bytes(range(200))
    raw_df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    wav_df = spark.createDataFrame(
        [(1, bytearray(make_wav(payload)))], "media_id long, payload binary"
    )
    raw = {r.win_idx: r for r in audio_window_features(raw_df, window=64, hop=32).collect()}
    wav = {
        r.win_idx: r
        for r in audio_window_features(
            wav_df, window=64, hop=32, container="wav"
        ).collect()
    }
    assert sorted(raw) == sorted(wav) == [0, 1, 2, 3, 4]
    for w in raw:
        assert wav[w].zcr == raw[w].zcr
        assert abs(wav[w].rms - raw[w].rms / 128.0) < 1e-6


def test_wrap_pcm_wav_column(spark):
    from syslog_ng_spark.operators.multimodal import decode_wav, wrap_pcm_wav

    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(100)))), (2, bytearray(b"\x80" * 50))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: bytes(r.payload) for r in wrap_pcm_wav(df).collect()}
    x1, rate = decode_wav(rows[1])
    assert rate == 8000 and len(x1) == 100
    x2, _ = decode_wav(rows[2])
    assert len(x2) == 50 and all(v == 0.0 for v in x2)


# ---------------------------------------------------------------------------
# PNG decode (stdlib zlib + numpy un-filter)
# ---------------------------------------------------------------------------


def _rand_img(shape, seed=3):
    import numpy as np

    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


def test_png_roundtrip_every_filter_and_colortype():
    """make_png forces one spec filter per encode; decode must recover
    the exact pixels for every filter (None/Sub/Up/Average/Paeth) and
    every supported channel count."""
    import numpy as np

    from syslog_ng_spark.operators.multimodal import decode_png, make_png

    for ch in (1, 2, 3, 4):
        img = _rand_img((13, 17, ch), seed=ch)
        for f in range(5):
            got = decode_png(make_png(img, filter_type=f))
            assert got.shape == (13, 17, ch), (ch, f)
            assert np.array_equal(got, img), (ch, f)


def test_png_decodes_real_system_png():
    """A PNG written by a real encoder (git's logo, shipped with the
    OS) — dimensions must match IHDR and pixels must be plausible."""
    from pathlib import Path

    import pytest

    from syslog_ng_spark.operators.multimodal import decode_png

    p = Path("/usr/share/gitweb/static/git-logo.png")
    if not p.exists():
        pytest.skip("no system png available")
    payload = p.read_bytes()
    import struct

    w, h = struct.unpack(">II", payload[16:24])
    img = decode_png(payload)
    assert img.shape[0] == h and img.shape[1] == w
    assert img.size > 0


def test_png_loud_fail_on_non_png_and_unsupported():
    import pytest

    from syslog_ng_spark.operators.multimodal import decode_png, make_png

    with pytest.raises(NotImplementedError, match="PNG"):
        decode_png(b"\xff\xd8\xff\xe0 jpeg-ish")
    # 16-bit: rewrite the IHDR depth byte of a valid png
    blob = bytearray(make_png(_rand_img((4, 4, 3))))
    blob[24] = 16  # bit depth byte in IHDR
    with pytest.raises(NotImplementedError, match="bit_depth"):
        decode_png(bytes(blob))


def test_png_palette_image():
    import struct
    import zlib

    import numpy as np

    from syslog_ng_spark.operators.multimodal import decode_png

    # hand-built 2x2 palette png: indices [[0,1],[1,0]]
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 0, 255])  # red, blue
    raw = b"\x00\x00\x01" + b"\x00\x01\x00"
    img = decode_png(
        sig + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[0, 1].tolist() == [0, 0, 255]
    assert np.array_equal(img[0], img[1][::-1])


def test_image_pixel_stats_spark(spark):
    import numpy as np

    from syslog_ng_spark.operators.multimodal import image_pixel_stats, make_png

    imgs = {1: _rand_img((8, 6, 3), seed=1), 2: _rand_img((5, 5, 1), seed=2)}
    df = spark.createDataFrame(
        [(k, bytearray(make_png(v, filter_type=4))) for k, v in imgs.items()],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in image_pixel_stats(df).collect()}
    assert (rows[1].width, rows[1].height, rows[1].channels) == (6, 8, 3)
    assert (rows[2].width, rows[2].height, rows[2].channels) == (5, 5, 1)
    for k, img in imgs.items():
        x = img.reshape(-1, img.shape[2]).astype(np.float64)
        assert rows[k].mean == [round(v, 6) for v in x.mean(axis=0)]
        assert rows[k].std == [round(v, 6) for v in x.std(axis=0)]


# ---------------------------------------------------------------------------
# quality classifier (hashed n-gram LR: train distributed, score pure-Column)
# ---------------------------------------------------------------------------


def test_quality_classifier_trains_and_separates(spark):
    """Separable corpus (two disjoint vocabularies) -> the trained
    classifier pushes the two classes to opposite ends of [0,1], and
    the pure-Column scorer matches a pure-Python replay of
    sigmoid(w0 + sum w[bucket]) exactly."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    rows = []
    for i in range(300):
        lab = i % 2
        words = ["alpha beta gamma delta", "zonk quux blorp wibble"][lab]
        rows.append((i, (words + " ") * (3 + i % 4), lab))
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w = textstats.quality_classifier_train(df, "label", dim=64, max_iter=30)
    assert len(w) == 65
    scored = textstats.quality_classifier_score(df, w)
    agg = {
        r.label: r.avg_q
        for r in scored.join(df.select("doc_id", "label"), "doc_id")
        .groupBy("label")
        .agg(F.round(F.avg("q_score"), 4).alias("avg_q"))
        .collect()
    }
    assert agg[1] > 0.95 and agg[0] < 0.05

    def replay(text, dim=64):
        toks = [t for t in " ".join(text.lower().split()).split(" ") if t]
        u = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim for t in toks]
        feats = u + ([(u[i] * 31 + u[i + 1]) % dim for i in range(len(u) - 1)] if len(u) >= 2 else [])
        logit = w[0] + sum(w[1 + b] for b in feats)
        return round(1 / (1 + math.exp(-logit)), 6)

    got = {r.doc_id: r.q_score for r in scored.where(F.col("doc_id") < 6).collect()}
    for i in range(6):
        assert got[i] == replay(rows[i][1]), i


def test_quality_classifier_frozen_fixture_direction(spark):
    """The committed fixture was trained on 'length >= median' labels:
    on a held-out sf, longer docs must score higher on average (the
    direction survives the sf change even though the median differs)."""
    from pyspark.sql import functions as F

    from syslog_ng_spark.quality_fixtures import QC_DIM, QC_WEIGHTS

    assert len(QC_WEIGHTS) == QC_DIM + 1
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = textstats.quality_classifier_score(docs, QC_WEIGHTS).join(
        docs.select("doc_id", textstats.token_count(F.col("text")).alias("n_tok")),
        "doc_id",
    )
    agg = {
        r.long: r.avg_q
        for r in scored.groupBy((F.col("n_tok") >= 56).alias("long"))
        .agg(F.avg("q_score").alias("avg_q"))
        .collect()
    }
    assert agg[True] > agg[False]


def test_quality_classifier_score_validates_weights(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textstats.quality_classifier_score(df, [0.5])


# ---------------------------------------------------------------------------
# MP3 container metadata (r10): frame-header walk, no audio decode
# ---------------------------------------------------------------------------


def test_mp3_metadata_frame_walk():
    from syslog_ng_spark.operators.multimodal import make_mp3_stub, mp3_metadata

    # 38 frames of MPEG1 L3 @128 kbps 44.1 kHz stereo:
    # duration = 38*1152/44100, CBR → bitrate == 128
    m = mp3_metadata(make_mp3_stub(38))
    assert (m["codec"], m["mpeg_version"], m["layer"]) == ("mp3", "1", 3)
    assert (m["sample_rate"], m["channels"], m["frames"]) == (44100, 2, 38)
    assert m["duration_s"] == round(38 * 1152 / 44100, 6)
    assert m["bitrate_kbps"] == 128
    # mono, different rate/bitrate
    m = mp3_metadata(make_mp3_stub(10, bitrate=64, sample_rate=32000,
                                   channels=1))
    assert (m["sample_rate"], m["channels"], m["bitrate_kbps"]) == (32000, 1, 64)
    assert m["duration_s"] == round(10 * 1152 / 32000, 6)


def test_mp3_metadata_id3_and_truncation():
    from syslog_ng_spark.operators.multimodal import (
        Mp3Error,
        make_mp3_stub,
        mp3_metadata,
    )

    # leading ID3v2 tag skipped; trailing ID3v1 'TAG' block tolerated
    data = make_mp3_stub(5, id3=True) + b"TAG" + bytes(125)
    assert mp3_metadata(data)["frames"] == 5
    # truncated final frame: complete frames only
    whole = make_mp3_stub(4)
    assert mp3_metadata(whole[: len(whole) - 10])["frames"] == 3
    # named errors, never a silent guess
    with pytest.raises(Mp3Error, match="not an MPEG audio stream"):
        mp3_metadata(b"OggS" + bytes(64))
    with pytest.raises(Mp3Error, match="free-format"):
        hdr = (0x7FF << 21) | (3 << 19) | (1 << 17) | (0 << 12)
        mp3_metadata(hdr.to_bytes(4, "big") + bytes(400))
    # garbage BETWEEN frames raises (after a valid first frame)
    with pytest.raises(Mp3Error):
        mp3_metadata(make_mp3_stub(2) + b"\x00garbage!" + bytes(500))


def test_mp3_metadata_vbr_is_exact():
    from syslog_ng_spark.operators.multimodal import make_mp3_stub, mp3_metadata

    vbr = make_mp3_stub(10, bitrate=64) + make_mp3_stub(10, bitrate=320)
    m = mp3_metadata(vbr)
    assert m["frames"] == 20
    assert m["duration_s"] == round(20 * 1152 / 44100, 6)
    assert 64 < m["bitrate_kbps"] < 320  # frame-length-weighted mean


def test_audio_metadata_operator_mixed_containers(spark):
    from syslog_ng_spark.operators.multimodal import (
        audio_metadata,
        make_mp3_stub,
        make_wav,
    )

    wav = make_wav(bytes(range(200)) * 10, sample_rate=8000, sampwidth=1, channels=1)
    mp3 = make_mp3_stub(25, bitrate=128, sample_rate=44100, channels=2,
                        id3=True)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(mp3))],
        "media_id long, payload binary")
    rows = {r["media_id"]: r for r in audio_metadata(df).collect()}
    assert rows[1]["codec"] == "wav"
    assert rows[1]["sample_rate"] == 8000 and rows[1]["channels"] == 1
    assert rows[1]["frames"] == 2000
    assert rows[1]["duration_s"] == 0.25
    assert rows[1]["bitrate_kbps"] == 64  # 8000 Hz × 8 bit × 1 ch
    assert rows[2]["codec"] == "mp3"
    assert rows[2]["frames"] == 25 and rows[2]["channels"] == 2
    # unknown container: the task fails loudly with the swap instruction
    bad = spark.createDataFrame([(3, bytearray(b"OggS" + bytes(32)))],
                                "media_id long, payload binary")
    with pytest.raises(Exception, match="unrecognized audio container|Mp3Error"):
        audio_metadata(bad).collect()
