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
