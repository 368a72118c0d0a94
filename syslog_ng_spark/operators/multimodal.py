"""Multimodal column plumbing (LLM-pipeline extension).

Images/audio/video ride as opaque ``binary`` columns plus typed
metadata. The Spark-side machinery — schema, Arrow batching via
mapInPandas, partition sizing — is real and tested; the actual codec
calls are stubbed (image/audio libraries are not in this container)
behind `DECODERS`, which a deployment replaces with PIL/ffmpeg calls.

Scale notes: binary payloads dominate row size, so
`spark.sql.files.maxPartitionBytes` governs batch memory; mapInPandas
streams Arrow record batches so a partition never fully materializes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, mime string, n_bytes long"

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, sha256 string, feat array<float>"


def attach_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns every multimodal pipeline needs up front —
    computed JVM-side (no decode)."""
    return df.withColumns(
        {
            "n_bytes": F.length(F.col(payload_col)).cast("long"),
            "sha256": F.sha2(F.col(payload_col), 256),
        }
    )


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: features derived from
    the payload digest. Replace via DECODERS for real codecs."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def _real_decode_unavailable(payload: bytes, dim: int = 8) -> list[float]:
    raise NotImplementedError(
        "image/audio codecs are not installed in this environment; "
        "swap DECODERS['decode'] for a PIL/torchaudio/ffmpeg-backed fn"
    )


DECODERS = {"decode": _fake_decode_features}


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, per-batch decode
    loop runs in Python but payload bytes cross once, columnar."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = DECODERS["decode"]
        for pdf in batches:
            feats = [decode(p, dim) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "sha256": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                    "feat": feats,
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_idx) rows for
    a downstream decoder — demonstrates explode-based fan-out sizing
    without decoding. n_frames is stubbed as n_bytes//1000."""
    n_frames = (F.col("n_bytes") / 1000).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.select("media_id", F.explode(idx).alias("frame_idx"))


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = repeated id
    bytes; sizes vary by id)."""
    rows = [
        (i, ["image", "audio", "video"][i % 3], bytes([i % 256]) * (100 + 37 * (i % 13)), "application/octet-stream")
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary, mime string")
    return attach_metadata(df)


def make_wav(
    pcm: bytes,
    sample_rate: int = 8000,
    sampwidth: int = 1,
    channels: int = 1,
) -> bytes:
    """Build a PCM WAV container around raw sample bytes — stdlib
    `wave`, no codec library. Test/fixture helper and the inverse of
    `decode_wav` (round-trip pytested for widths 1/2/3/4, mono+stereo)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(pcm)
    return buf.getvalue()


def decode_wav(payload: bytes):
    """Real WAV container decode with ONLY the stdlib: parse the RIFF
    header via `wave`, convert PCM samples (8-bit unsigned, 16/24/32-bit
    signed little-endian) to mono float64 in [-1, 1). Returns
    (samples, sample_rate). Multi-channel input is averaged to mono.

    Lossy/compressed containers (mp3, ogg, non-PCM WAV) stay behind the
    loud-fail stub — `wave` rejects them and we re-raise with the
    DECODERS swap instruction, same contract as `_real_decode_unavailable`."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
            nch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
            raw = w.readframes(w.getnframes())
    except wave.Error as e:
        raise NotImplementedError(
            f"not an uncompressed PCM WAV ({e}); lossy codecs are not "
            "installed in this environment — swap DECODERS for an "
            "ffmpeg/torchaudio-backed decoder"
        ) from e
    if width == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        # little-endian 24-bit two's complement -> int32 via sign byte
        x = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int8).astype(np.int32) << 16)
        ).astype(np.float64) / 8388608.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported PCM sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def wrap_pcm_wav(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    sample_rate: int = 8000,
) -> DataFrame:
    """Wrap a raw-byte column into 8-bit-PCM WAV containers (Arrow
    mapInPandas) — the fixture half of an end-to-end container test:
    wrap -> decode_wav -> DSP exercises the real header parse on every
    row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": [
                        make_wav(bytes(p), sample_rate=sample_rate)
                        for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        run, schema="media_id long, payload binary"
    )


AUDIO_FEATURE_SCHEMA = "media_id long, win_idx long, rms double, zcr double"


def audio_window_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    window: int = 64,
    hop: int = 32,
    container: str = "raw-u8",
) -> DataFrame:
    """Audio feature extraction: frame the sample stream into windows
    (window/hop), emit per-window RMS and zero-crossing rate. Real DSP
    with NO external library — vectorized numpy over Arrow batches,
    showing the full fan-out shape (one media row → many window rows)
    a production audio pipeline has. Windows shorter than `window` at
    the tail are dropped (standard framing).

    container='raw-u8': payloads are headerless unsigned-8-bit PCM
    (the original stub-era contract; values centered at 128).
    container='wav': payloads are real WAV files — `decode_wav` parses
    the RIFF header (stdlib `wave`) and normalizes 8/16/24/32-bit PCM
    to mono float64 in [-1,1), so the whole pipeline is a genuine
    container decode end-to-end. Lossy formats loud-fail (see
    decode_wav)."""
    import numpy as np

    if container not in ("raw-u8", "wav"):
        raise ValueError(f"unknown container {container!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, rms, zcr = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                if container == "wav":
                    x, _rate = decode_wav(bytes(payload))
                else:
                    x = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.float64)
                n = (len(x) - window) // hop + 1 if len(x) >= window else 0
                for w in range(n):
                    seg = x[w * hop : w * hop + window]
                    centered = seg if container == "wav" else seg - 128.0
                    ids.append(mid)
                    widx.append(w)
                    rms.append(round(float(np.sqrt(np.mean(centered**2))), 6))
                    zcr.append(
                        round(float(np.mean(np.signbit(centered[:-1]) != np.signbit(centered[1:]))), 6)
                    )
            yield pd.DataFrame({"media_id": ids, "win_idx": widx, "rms": rms, "zcr": zcr})

    return df.select(
        F.col(id_col).alias("media_id"), F.col(payload_col)
    ).mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


def image_tile_plan(
    df: DataFrame,
    width_col: str = "width",
    height_col: str = "height",
    id_col: str = "media_id",
    tile: int = 224,
) -> DataFrame:
    """Image tiling fan-out plan: one row per (tile_x, tile_y) crop a
    downstream decoder would cut — the partition-sizing half of a
    vision-preprocessing pipeline, computed JVM-side from metadata
    only (no decode)."""
    nx = F.ceil(F.col(width_col) / tile).cast("int")
    ny = F.ceil(F.col(height_col) / tile).cast("int")
    tx = F.explode(F.sequence(F.lit(0), F.greatest(nx - 1, F.lit(0)))).alias("tile_x")
    out = df.select(F.col(id_col), F.col(width_col), F.col(height_col), tx)
    ty = F.explode(F.sequence(F.lit(0), F.greatest(ny - 1, F.lit(0)))).alias("tile_y")
    return out.select(id_col, "tile_x", ty)
