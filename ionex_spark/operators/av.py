"""Audio / video payload operators — Arrow-batched pandas UDFs over the
opaque binary columns (the image pipeline's siblings, SURVEY.md §2.10 /
the brief's 'decode / feature-extract / resize / frame-sample').

Scale shape mirrors operators/multimodal.py: metadata queries never read
the bytes column (payload discipline — column pruning keeps the binary
out of the scan), decode runs only where features are requested, and the
UDFs are mapInPandas batches (NO per-row Python)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

AUDIO_FEATURES_SCHEMA = (
    "audio_id string, duration_s double, rms double, zero_cross_rate double"
)

FRAMES_SCHEMA = (
    "video_id string, frame_idx int, w int, h int, frame_phash bigint"
)


def audio_features(audio: DataFrame) -> DataFrame:
    """Decode PCM payloads -> (duration, RMS energy, zero-crossing rate).

    The classic cheap audio-quality/speech-detection features; a real
    pipeline would append spectral features the same way — the batching
    and schema don't change."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ionex_spark.core import av_codec

        for pdf in it:
            out = []
            for aid, data, codec in zip(
                pdf["audio_id"], pdf["bytes"], pdf["codec"]
            ):
                samples, rate = av_codec.decode_audio(data, codec)
                n = len(samples)
                rms = float(np.sqrt(np.mean(samples**2))) if n else 0.0
                zc = (
                    float(np.mean(np.signbit(samples[1:])
                                  != np.signbit(samples[:-1])))
                    if n > 1
                    else 0.0
                )
                out.append(
                    {
                        "audio_id": aid,
                        "duration_s": n / rate if rate else 0.0,
                        "rms": rms,
                        "zero_cross_rate": zc,
                    }
                )
            yield pd.DataFrame(out)

    return audio.select("audio_id", "bytes", "codec").mapInPandas(
        fn, AUDIO_FEATURES_SCHEMA
    )


def sample_frames(videos: DataFrame, every: int = 4) -> DataFrame:
    """Frame sampling: decode each video payload, keep every k-th frame,
    emit one row per kept frame with its perceptual hash — the rows feed
    the IMAGE pipeline (near-dup frame detection, tile assignment)
    unchanged.  One input row fans out to ceil(n_frames / every) output
    rows inside the UDF: a narrow generate, no join, no shuffle."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ionex_spark.core import av_codec, codec

        for pdf in it:
            out = []
            for vid, data, cname in zip(
                pdf["video_id"], pdf["bytes"], pdf["codec"]
            ):
                frames, _fps = av_codec.decode_video(data, cname)
                for k in range(0, frames.shape[0], every):
                    # phash64 takes an (h, w, 3) image; gray -> 3-channel
                    f = np.repeat(frames[k][:, :, None], 3, axis=2)
                    out.append(
                        {
                            "video_id": vid,
                            "frame_idx": k,
                            "w": int(f.shape[1]),
                            "h": int(f.shape[0]),
                            "frame_phash": codec.phash64(f),
                        }
                    )
            yield pd.DataFrame(out)

    return videos.select("video_id", "bytes", "codec").mapInPandas(
        fn, FRAMES_SCHEMA
    )
