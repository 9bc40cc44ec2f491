"""Distributed generators of `audio` / `videos` tables — the audio/video
siblings of sources/images.py, same design: spark.range -> mapInPandas,
every row a pure function of its id (deterministic, resume-idempotent,
no shuffle), opaque binary payload + typed metadata + the lat/lon/slot
columns that route every row through the spatial/temporal join."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

AUDIO_SCHEMA = (
    "audio_id string, bytes binary, sample_rate int, n_samples int, "
    "codec string, transcript string, lat double, lon double, slot bigint"
)

VIDEO_SCHEMA = (
    "video_id string, bytes binary, w int, h int, n_frames int, fps int, "
    "codec string, caption string, lat double, lon double, slot bigint"
)


def _geo(i: int) -> tuple[float, float, int]:
    lat = (i * 37 % 1700) / 10.0 - 85.0
    lon = (i * 53 % 3600) / 10.0 - 180.0
    return lat, lon, i % 25


def _audio_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ionex_spark.core import av_codec

    for pdf in it:
        rows = []
        for i in (int(x) for x in pdf["id"]):
            rate = 8000
            n = 800 + (i % 5) * 400  # 0.1 - 0.6 s
            t = np.arange(n, dtype=np.float64) / rate
            freq = 100.0 + (i % 40) * 25.0
            samples = np.rint(
                3000.0 * np.sin(2.0 * np.pi * freq * t)
                + ((np.arange(n) * (i + 7)) % 997 - 498) / 4.0
            )
            lat, lon, slot = _geo(i)
            rows.append(
                {
                    "audio_id": f"aud-{i:012d}",
                    "bytes": av_codec.pcm16_encode(samples, rate),
                    "sample_rate": rate,
                    "n_samples": n,
                    "codec": "pcm16",
                    "transcript": f"utterance {i} tone {int(freq)}",
                    "lat": lat,
                    "lon": lon,
                    "slot": slot,
                }
            )
        yield pd.DataFrame(rows)


def _video_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from ionex_spark.core import av_codec

    w, h = 32, 24
    base = None
    for pdf in it:
        if base is None:
            y, x = np.mgrid[0:h, 0:w]
            base = x + y
        rows = []
        for i in (int(x) for x in pdf["id"]):
            n_frames = 8 + (i % 3) * 4
            frames = np.stack(
                [(base + 3 * k + i) % 256 for k in range(n_frames)]
            ).astype(np.uint8)
            lat, lon, slot = _geo(i)
            rows.append(
                {
                    "video_id": f"vid-{i:012d}",
                    "bytes": av_codec.rawv_encode(frames, fps=24),
                    "w": w,
                    "h": h,
                    "n_frames": n_frames,
                    "fps": 24,
                    "codec": "rawv",
                    "caption": f"clip {i} of {n_frames} frames",
                    "lat": lat,
                    "lon": lon,
                    "slot": slot,
                }
            )
        yield pd.DataFrame(rows)


def audio_df(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    rng = spark.range(0, n, 1, partitions or max(1, min(64, n // 500 or 1)))
    return rng.mapInPandas(_audio_batches, AUDIO_SCHEMA)


def videos_df(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    rng = spark.range(0, n, 1, partitions or max(1, min(64, n // 500 or 1)))
    return rng.mapInPandas(_video_batches, VIDEO_SCHEMA)
