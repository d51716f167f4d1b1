"""Deterministic multimodal fixtures: audio (PCM16) and video (raw
frame stacks) as binary-payload tables.

Mirrors the image fixture convention (sources/images.py): payload bytes
are generated distributed (mapInPandas over spark.range — no driver
materialization) from pure integer formulas of the row key, so a DuckDB
oracle can recompute every *decoded* statistic from `generate_series`
without ever touching the binary — which is what makes the driver's
value-hash gate meaningful for binary decode plumbing.

Schema convention for opaque media columns (the engine's multimodal
data model): ``(media_id bigint, bytes binary, fmt string, <typed
metadata>)`` — the RasterTile pattern (payload + typed metadata,
extensions/adapters/raster/.../RasterTile.java) generalized to
non-raster payloads.

Formats:
  pcm16   — little-endian int16 mono samples (real decode, numpy)
  rawv16  — concatenated 16x16 uint8 grayscale frames (real decode)
  mp3/h264 — recognized but STUBBED (NotImplementedError in the codec;
             the container has no audio/video libraries)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

K1 = 2654435761
K2 = 2246822519
KF = 7919  # frame mixing prime

# audio: n_samples = AUD_BASE + (key % AUD_MOD) * AUD_STEP
AUD_BASE, AUD_MOD, AUD_STEP = 800, 7, 100
SAMPLE_RATE = 16_000

# video: 16x16 frames, n_frames = VID_BASE + key % VID_MOD
VID_W = VID_H = 16
VID_BASE, VID_MOD = 4, 3


def audio_samples(key: int) -> np.ndarray:
    """int16 sample vector for a key — the single source of truth the
    PCM bytes are built from (and the formula the oracle re-derives):
    s_i = ((key*K1 + i*K2) mod 65536) - 32768."""
    n = AUD_BASE + (key % AUD_MOD) * AUD_STEP
    i = np.arange(n, dtype=np.int64)
    return ((key * K1 + i * K2) % 65536 - 32768).astype(np.int16)


def video_frames(key: int) -> np.ndarray:
    """(n_frames, 16, 16) uint8 frame stack:
    px(f, y, x) = (key*13 + f*KF + y*29 + x*7) mod 256."""
    nf = VID_BASE + key % VID_MOD
    f, y, x = np.meshgrid(
        np.arange(nf, dtype=np.int64),
        np.arange(VID_H, dtype=np.int64),
        np.arange(VID_W, dtype=np.int64),
        indexing="ij",
    )
    return ((key * 13 + f * KF + y * 29 + x * 7) % 256).astype(np.uint8)


def audio_table(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """(media_id, bytes, fmt, sample_rate, n_samples) — PCM16 payloads."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key in pdf["id"]:
                s = audio_samples(int(key))
                rows.append(
                    (int(key), s.tobytes(), "pcm16", SAMPLE_RATE, len(s))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "bytes", "fmt", "sample_rate", "n_samples"]
            )

    return spark.range(0, n, 1, partitions).mapInPandas(
        gen, "media_id long, bytes binary, fmt string, sample_rate int, n_samples int"
    )


def video_table(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """(media_id, bytes, fmt, w, h, n_frames) — raw frame-stack payloads."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key in pdf["id"]:
                fr = video_frames(int(key))
                rows.append(
                    (int(key), fr.tobytes(), "rawv16", VID_W, VID_H, fr.shape[0])
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "bytes", "fmt", "w", "h", "n_frames"]
            )

    return spark.range(0, n, 1, partitions).mapInPandas(
        gen, "media_id long, bytes binary, fmt string, w int, h int, n_frames int"
    )


# ------------------------------------------------------------ oracle SQL


def audio_stats_sql(n: int) -> str:
    """DuckDB SQL recomputing the decoded-audio statistics from the
    generator formula (never reads bytes)."""
    return (
        f"WITH m AS (SELECT unnest(generate_series(0, {n - 1})) AS media_id), "
        f"a AS (SELECT media_id, {AUD_BASE} + (media_id % {AUD_MOD}) * {AUD_STEP} AS ns FROM m), "
        f"s AS (SELECT media_id, i, ((media_id * {K1} + i * {K2}) % 65536) - 32768 AS v "
        "FROM a, unnest(generate_series(0, ns - 1)) AS t(i)), "
        "w AS (SELECT media_id, v, lag(v) OVER (PARTITION BY media_id ORDER BY i) AS pv FROM s) "
        "SELECT media_id, CAST(count(*) AS INT) AS n_samples, "
        "CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS sum_sq, "
        "CAST(count(*) FILTER (WHERE (v < 0) <> (pv < 0)) AS INT) AS zero_cross "
        "FROM w GROUP BY media_id"
    )


def video_frame_sample_sql(n: int, every: int) -> str:
    """DuckDB SQL recomputing sampled-frame pixel sums from the formula."""
    return (
        f"WITH m AS (SELECT unnest(generate_series(0, {n - 1})) AS media_id), "
        f"v AS (SELECT media_id, {VID_BASE} + media_id % {VID_MOD} AS nf FROM m), "
        "f AS (SELECT media_id, fi FROM v, unnest(generate_series(0, nf - 1)) AS t(fi) "
        f"WHERE fi % {every} = 0), "
        f"px AS (SELECT media_id, fi, (media_id * 13 + fi * {KF} + y * 29 + x * 7) % 256 AS p "
        f"FROM f, unnest(generate_series(0, {VID_H - 1})) AS ty(y), "
        f"unnest(generate_series(0, {VID_W - 1})) AS tx(x)) "
        "SELECT media_id, CAST(fi AS INT) AS frame_idx, "
        "CAST(sum(p) AS BIGINT) AS sum_px FROM px GROUP BY media_id, fi"
    )
