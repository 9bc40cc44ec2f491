"""Audio/video payload plumbing: codec round-trips, feature extraction,
frame sampling, payload discipline (bytes pruned from metadata scans)."""

import numpy as np
import pytest

from ionex_spark.core import av_codec
from ionex_spark.operators import av
from ionex_spark.sources.media import audio_df, videos_df

pytestmark = pytest.mark.spark


def test_pcm16_roundtrip():
    s = np.array([0, 100, -100, 32767, -32768, 5], dtype=np.int64)
    data = av_codec.pcm16_encode(s, 8000)
    out, rate = av_codec.pcm16_decode(data)
    assert rate == 8000
    np.testing.assert_array_equal(out, s.astype(np.float64))


def test_rawv_roundtrip():
    frames = (np.arange(2 * 4 * 6).reshape(2, 4, 6) % 256).astype(np.uint8)
    data = av_codec.rawv_encode(frames, fps=30)
    out, fps = av_codec.rawv_decode(data)
    assert fps == 30
    np.testing.assert_array_equal(out, frames)


def test_compressed_codecs_are_documented_stubs():
    with pytest.raises(NotImplementedError):
        av_codec.decode_audio(b"xxxx", "mp3")
    with pytest.raises(NotImplementedError):
        av_codec.decode_video(b"xxxx", "h264")


def test_audio_features_match_numpy(spark):
    aud = audio_df(spark, 40, partitions=2)
    got = av.audio_features(aud).toPandas().set_index("audio_id")
    raw = aud.select("audio_id", "bytes", "codec", "n_samples").toPandas()
    assert len(got) == 40
    for _, r in raw.iterrows():
        samples, rate = av_codec.decode_audio(r["bytes"], r["codec"])
        assert len(samples) == r["n_samples"]
        g = got.loc[r["audio_id"]]
        assert g["duration_s"] == pytest.approx(len(samples) / rate)
        assert g["rms"] == pytest.approx(
            float(np.sqrt(np.mean(samples**2)))
        )
        assert 0.0 < g["zero_cross_rate"] < 1.0


def test_frame_sampling_feeds_image_pipeline(spark):
    vids = videos_df(spark, 20, partitions=2)
    frames = av.sample_frames(vids, every=4).toPandas()
    meta = vids.select("video_id", "n_frames", "w", "h").toPandas()
    want_rows = int(sum(-(-n // 4) for n in meta["n_frames"]))
    assert len(frames) == want_rows
    assert (frames["frame_idx"] % 4 == 0).all()
    assert set(frames["w"]) == {32} and set(frames["h"]) == {24}
    # phash is deterministic: same video re-decoded gives identical hashes
    again = av.sample_frames(vids, every=4).toPandas()
    a = frames.sort_values(["video_id", "frame_idx"]).reset_index(drop=True)
    b = again.sort_values(["video_id", "frame_idx"]).reset_index(drop=True)
    np.testing.assert_array_equal(a["frame_phash"], b["frame_phash"])
    # every sampled frame of a clip hashes differently (content moves);
    # a broken gray->3-channel conversion or DC-only hash collapses them
    one = a[a["video_id"] == a["video_id"].iloc[0]]
    assert one["frame_phash"].nunique() == len(one)


def test_av_metadata_scan_prunes_bytes(spark, tmp_path):
    """Payload discipline for the new modalities: a metadata-only query
    over the written table must not read the binary column."""
    p = str(tmp_path / "vids")
    videos_df(spark, 50, partitions=2).write.parquet(p)
    vids = spark.read.parquet(p)
    lean = vids.groupBy("codec").count()
    plan = lean._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan and "bytes" not in scan[0].split("ReadSchema:")[1]


def test_av_rows_route_through_spatial_join(spark):
    """Audio/video rows carry lat/lon/slot: they join the TEC grid like
    any other modality (multimodal rows are first-class spatially)."""
    from ionex_spark.operators import spatial

    aud = audio_df(spark, 100, partitions=2).drop("bytes")
    cells = spatial.build_tec_cells(spark)
    out = spatial.spatial_join_bilinear(aud, cells)
    assert out.filter("tec is not null").count() > 0


def test_audio_fingerprint_twins_and_distinct(spark):
    """Planted twin: the same samples re-encoded with ±1-unit noise
    fingerprint 0-2 hamming away; clips of different tone/length are
    far apart; the near-dup join finds exactly the planted twins."""
    import numpy as np
    import pandas as pd

    from ionex_spark.core import av_codec
    from ionex_spark.operators import av

    rate = 8000
    rng = np.random.RandomState(3)
    rows = []
    for i in range(12):
        n = 800 + (i % 5) * 400
        t = np.arange(n) / rate
        samples = np.rint(3000.0 * np.sin(2 * np.pi * (100 + i * 40) * t))
        rows.append((f"a{i}", av_codec.pcm16_encode(samples, rate), "pcm16"))
        # noised twin of every third clip
        if i % 3 == 0:
            noisy = samples + rng.randint(-1, 2, size=n)
            rows.append(
                (f"a{i}-twin", av_codec.pcm16_encode(noisy, rate), "pcm16")
            )
    audio = spark.createDataFrame(
        rows, "audio_id string, bytes binary, codec string"
    )
    fps = {r.audio_id: r.fp64 for r in av.audio_fingerprint64(audio).collect()}

    def ham(a, b):
        return bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")

    for i in range(0, 12, 3):
        assert ham(f"a{i}", f"a{i}-twin") == 0, (i, ham(f"a{i}", f"a{i}-twin"))
    # different clips: hash-spread bands land far apart
    assert ham("a1", "a2") >= 8

    pairs = {(r.id_a, r.id_b)
             for r in av.audio_near_dup_pairs(audio, max_hamming=3).collect()}
    expected = {tuple(sorted((f"a{i}", f"a{i}-twin"))) for i in range(0, 12, 3)}
    assert {tuple(sorted(p)) for p in pairs} == expected


def test_video_signature_majority_robust(spark):
    """Majority-of-frame-phashes: a video with a few corrupted frames
    keeps the same signature (minority outvoted); the near-dup join
    pairs original with corrupted copy and nothing else."""
    import numpy as np

    from ionex_spark.core import av_codec
    from ionex_spark.operators import av

    rng = np.random.RandomState(7)

    def make_video(seed, corrupt_frames=()):
        nf, h, w = 9, 16, 16
        rs = np.random.RandomState(seed)
        base = rs.randint(0, 255, size=(h, w), dtype=np.uint8)
        frames = np.stack([base] * nf)
        for f in corrupt_frames:
            frames[f] = rng.randint(0, 255, size=(h, w), dtype=np.uint8)
        return av_codec.rawv_encode(frames, fps=24)

    rows = [
        ("v0", make_video(1), "rawv"),
        ("v0-copy", make_video(1, corrupt_frames=(2,)), "rawv"),
        ("v1", make_video(2), "rawv"),
        ("v2", make_video(3), "rawv"),
    ]
    videos = spark.createDataFrame(
        rows, "video_id string, bytes binary, codec string"
    )
    sigs = {r.video_id: r.sig64
            for r in av.video_signature64(videos, every=1).collect()}
    assert sigs["v0"] == sigs["v0-copy"]  # minority frame outvoted
    assert sigs["v0"] != sigs["v1"]

    pairs = {tuple(sorted((r.id_a, r.id_b)))
             for r in av.video_near_dup_pairs(videos, max_hamming=3,
                                              every=1).collect()}
    assert pairs == {("v0", "v0-copy")}
