"""Audio-column operators: decode-verify, feature extraction, resample,
metadata-only gating — the audio leg of the multimodal contract.

Same invariants as the image leg (functions/imageops.py): audio is an
opaque ``binary`` cell plus typed metadata; decoding happens ONLY inside
Arrow batches in the scan stage (bytes never shuffle); corrupt inputs
yield (ok=False, reason), never an exception. The codec seam is
io/audiocodec.decode_audio — a soundfile/librosa decoder swaps in there
without touching any plan (the real wheels are absent from this sandbox,
BENCH.md "Environment attempts").

- ``audio_features``: duration, RMS, peak, zero-crossing rate, silence
  ratio (|x| < 1% FS), clip ratio (|x| ≥ 99.9% FS) — the quality signals
  an audio-caption pipeline gates on (DataComp-style audio filtering).
- ``resample_audio``: linear-interpolation resample + re-encode; NULL on
  corrupt input (tolerated-failure path).
- ``audio_rules``: METADATA-ONLY keep/drop gate (declared rate + sample
  count) — pure JVM expressions, so the scan never touches bytes for
  rows that fail on metadata alone (the image_rules pattern).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from corpusama_spark.io.audiocodec import decode_audio, encode_qaud

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("audio_ok", BooleanType()),
        StructField("audio_reason", StringType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("zero_cross_rate", DoubleType()),
        StructField("silence_ratio", DoubleType()),
        StructField("clip_ratio", DoubleType()),
    ]
)

_FS = 32767.0


def _features_one(data: bytes) -> dict:
    try:
        rate, s = decode_audio(data)
    except ValueError as e:
        return {
            "audio_ok": False,
            "audio_reason": str(e),
            "sample_rate": None,
            "n_samples": None,
            "duration_s": None,
            "rms": None,
            "peak": None,
            "zero_cross_rate": None,
            "silence_ratio": None,
            "clip_ratio": None,
        }
    x = s.astype(np.float64) / _FS
    n = len(x)
    zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    return {
        "audio_ok": True,
        "audio_reason": None,
        "sample_rate": int(rate),
        "n_samples": n,
        "duration_s": round(n / rate, 6),
        "rms": round(float(np.sqrt(np.mean(x * x))) if n else 0.0, 6),
        "peak": round(float(np.max(np.abs(x))) if n else 0.0, 6),
        "zero_cross_rate": round(zc, 6),
        "silence_ratio": round(float(np.mean(np.abs(x) < 0.01)) if n else 1.0, 6),
        "clip_ratio": round(float(np.mean(np.abs(x) >= 0.999)) if n else 0.0, 6),
    }


def audio_features(bytes_col) -> Column:
    """Struct of decode-verify + quality features; Arrow-batched, scan
    stage, corrupt → (ok=False, reason)."""

    @F.pandas_udf(AUDIO_FEATURES_SCHEMA)
    def _feat(batch: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for chunk in batch:
            yield pd.DataFrame([_features_one(b) for b in chunk])

    return _feat(bytes_col)


def resample_audio(bytes_col, target_rate: int) -> Column:
    """Linear-interp resample re-encoded as QAUD; NULL on corrupt input."""

    def _one(data: bytes) -> bytes | None:
        try:
            rate, s = decode_audio(data)
        except ValueError:
            return None
        if rate == target_rate:
            return bytes(data)
        n_out = max(int(round(len(s) * target_rate / rate)), 1)
        src_pos = np.linspace(0, max(len(s) - 1, 0), n_out)
        out = np.interp(src_pos, np.arange(len(s)), s.astype(np.float64))
        return encode_qaud(out.astype("<i2"), target_rate)

    @F.pandas_udf("binary")
    def _res(batch: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for chunk in batch:
            yield pd.Series([_one(b) for b in chunk], dtype=object)

    return _res(bytes_col)


def audio_rules(
    df: DataFrame,
    rate_col: str = "sample_rate",
    n_col: str = "n_samples",
    min_seconds: float = 0.1,
    max_seconds: float = 600.0,
    allowed_rates: tuple[int, ...] = (8000, 16000, 22050, 44100, 48000),
) -> DataFrame:
    """Metadata-only audio gate: keep/drop + first-failing reason from the
    DECLARED rate and sample count — pure JVM, bytes untouched, so the
    expensive decode only ever runs on rows that pass (image_rules
    pattern, oracled)."""
    duration = F.col(n_col) / F.col(rate_col)
    reason = (
        F.when(
            F.col(rate_col).isNull() | F.col(n_col).isNull(), "audio_meta_missing"
        )
        .when(~F.col(rate_col).isin(*allowed_rates), "audio_rate_unsupported")
        .when(F.col(n_col) <= 0, "audio_empty")
        .when(duration < min_seconds, "audio_too_short")
        .when(duration > max_seconds, "audio_too_long")
        .otherwise(F.lit(None).cast("string"))
    )
    return df.withColumn("audio_drop_reason", reason).withColumn(
        "audio_keep", F.col("audio_drop_reason").isNull()
    )


def audio_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "audio",
    frame: int = 1024,
    hop: int = 512,
    bands: int = 9,
) -> DataFrame:
    """Per-frame spectral sub-fingerprints in the Haitsma & Kalker 2002
    ("Philips robust hash") shape: each ``frame``-sample window yields
    an 8-bit code whose bit b is the SIGN of the time- and band-
    difference of log-spaced FFT band energies,
    bit(b) = 1{(E_t[b]−E_t[b+1]) − (E_{t−1}[b]−E_{t−1}[b+1]) > 0} —
    scale-invariant (amplitude changes multiply every energy, signs
    survive) and locally robust to noise, which is exactly what a
    re-encoded / re-levelled duplicate audio clip defeats exact hashing
    with. First frame has no predecessor → frames emit from t = 1.

    Output (id, frame_idx, subfp int 0..255). Decode and FFT run only
    inside Arrow batches; per clip only (id, ~n_samples/hop, 1-byte
    code) rows shuffle — bytes never do. Corrupt clips emit nothing
    (the tolerated-failure contract; pair them with audio_features for
    reasons).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        edges = None
        for pdf in batches:
            ids, fidx, codes = [], [], []
            for iid, data in zip(pdf["id"], pdf["b"]):
                try:
                    _sr, x = decode_audio(bytes(data))
                except Exception:  # noqa: BLE001 - tolerated failures
                    continue
                x = x.astype("float64")
                n = (len(x) - frame) // hop + 1
                if n < 2:
                    continue
                if edges is None:
                    # log-spaced band edges over the rfft bins
                    edges = np.unique(
                        np.geomspace(2, frame // 2, bands + 1).astype(int)
                    )
                wins = np.lib.stride_tricks.sliding_window_view(
                    x, frame
                )[::hop][:n]
                mags = np.abs(np.fft.rfft(wins, axis=1)) ** 2
                be = np.stack(
                    [
                        mags[:, edges[j]:edges[j + 1]].sum(axis=1)
                        for j in range(len(edges) - 1)
                    ],
                    axis=1,
                )
                d_band = be[:, :-1] - be[:, 1:]
                d_time = d_band[1:] - d_band[:-1]
                bits = (d_time > 0).astype(np.int64)
                sub = (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)
                ids.extend([iid] * len(sub))
                fidx.extend(range(1, len(sub) + 1))
                codes.extend(int(v) for v in sub)
            yield pd.DataFrame(
                {"id": ids, "frame_idx": fidx, "subfp": codes}
            )

    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(bytes_col).alias("b"),
    ).mapInPandas(gen, schema="id long, frame_idx int, subfp long")


def audio_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    bytes_col: str = "audio",
    min_matches: int = 4,
    max_bucket: int = 1024,
) -> DataFrame:
    """Audio near-duplicate pairs from fingerprint collisions: clips
    sharing ≥ ``min_matches`` identical (frame_idx, subfp) cells, with
    the matched-frame count and the aligned agreement share. The
    standard LSH discipline of every near-dup family here: the
    (frame_idx, subfp) equi-join is the bucket join (flood guard
    ``max_bucket`` drops degenerate cells — e.g. silence frames shared
    by everything), fingerprints are built once, and only candidate
    pairs get the full agreement count. Bytes never shuffle; the join
    key is 12 bytes."""
    fp = audio_fingerprints(df, id_col, bytes_col)
    ok = (
        fp.groupBy("frame_idx", "subfp")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") <= int(max_bucket))
        .select("frame_idx", "subfp")
    )
    fpg = fp.join(ok, ["frame_idx", "subfp"])
    a = fpg.select(
        F.col("id").alias("id_a"), "frame_idx", "subfp"
    )
    b = fpg.select(
        F.col("id").alias("id_b"), "frame_idx", "subfp"
    )
    pairs = (
        a.join(b, ["frame_idx", "subfp"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("matched"))
        .where(F.col("matched") >= int(min_matches))
    )
    lens = fp.groupBy("id").agg(F.count("*").alias("n_frames"))
    return (
        pairs.join(
            lens.withColumnsRenamed({"id": "id_a", "n_frames": "fa"}),
            "id_a",
        )
        .join(
            lens.withColumnsRenamed({"id": "id_b", "n_frames": "fb"}),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.col("matched").cast("long").alias("matched"),
            F.round(
                F.col("matched")
                / F.least("fa", "fb").cast("double"),
                6,
            ).alias("agreement"),
        )
        .orderBy("id_a", "id_b")
    )
