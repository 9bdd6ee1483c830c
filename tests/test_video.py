"""MJPEG-in-AVI video ingest: container round-trip, frame sampling,
loud failure on foreign codecs, and the Spark media pipeline end-to-end
(kind='video', mode='real')."""

import numpy as np
import pytest

from photohive_spark import multimodal, video


def _frames(n=6, h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return [np.clip(base.astype(int) + 20 * i, 0, 255).astype(np.uint8)
            for i in range(n)]


def test_avi_roundtrip_metadata_and_frames():
    frames = _frames()
    data = video.encode_avi_mjpeg(frames, fps=8.0, quality=95)
    meta = video.parse_avi(data)
    assert (meta["width"], meta["height"]) == (32, 24)
    assert meta["n_frames"] == 6 and len(meta["frames"]) == 6
    assert meta["fps"] == pytest.approx(8.0, rel=1e-4)
    decoded = video.decode_frames(data)
    assert len(decoded) == 6
    for orig, got in zip(frames, decoded):
        assert got.shape == orig.shape
        err = got.astype(float) - orig.astype(float)
        psnr = 10 * np.log10(255.0 ** 2 / (err ** 2).mean())
        assert psnr >= 30.0


def test_frame_sampling():
    data = video.encode_avi_mjpeg(_frames(n=9))
    assert video.sample_indices(9, 3) == [0, 4, 8]
    assert video.sample_indices(9, 1) == [0]
    assert video.sample_indices(2, 5) == [0, 1]
    assert len(video.decode_frames(data, n_sample=3)) == 3
    # gray sample stream: 3 frames x 24x32 pixels, values in [0,1]
    x = video.decode_video_gray_samples(data, n_sample=3)
    assert x.shape == (3 * 24 * 32,)
    assert 0.0 <= x.min() and x.max() <= 1.0


def test_foreign_codec_and_garbage_fail_loudly():
    with pytest.raises(ValueError, match="RIFF"):
        video.parse_avi(b"not an avi at all")
    data = bytearray(video.encode_avi_mjpeg(_frames(n=2)))
    at = bytes(data).index(b"vids") + 4
    data[at:at + 4] = b"H264"                 # fake codec fourcc
    at2 = bytes(data).index(b"MJPG", at + 4)  # strf biCompression
    data[at2:at2 + 4] = b"H264"
    with pytest.raises(ValueError, match="H264"):
        video.parse_avi(bytes(data))


def test_video_through_spark_media_features(spark):
    """kind='video' payloads run the REAL frame-sampled decode inside
    media_features — per-row values equal the locally computed kernel
    stats on the same sample stream."""
    from photohive_spark import kernels as K

    data = video.encode_avi_mjpeg(_frames(n=5), fps=5.0)
    rows = [("v0", "video", bytearray(data), None, None, None, 3)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feat = multimodal.media_features(media, mode="real").collect()[0]
    x = video.decode_video_gray_samples(data, n_sample=3)
    mean, std = K.rms_stats(x)
    assert feat.n_samples == len(x)
    assert feat.rms_mean == pytest.approx(mean, rel=1e-12)
    assert feat.rms_std == pytest.approx(std, rel=1e-12)


def test_animated_gif_as_video(spark):
    """Animated GIFs ride the same frame-sampled video contract as
    MJPEG-AVI (kind='video', mode='real')."""
    from photohive_spark import gif
    from photohive_spark import kernels as K

    rng = np.random.default_rng(12)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    frames = [rng.integers(0, 8, (10, 14), dtype=np.uint8)
              for _ in range(6)]
    data = gif.encode_gif(frames, palette=pal)
    decoded = video.decode_frames(data, n_sample=3)
    assert len(decoded) == 3 and decoded[0].shape == (10, 14, 3)
    x = video.decode_video_gray_samples(data, n_sample=3)
    assert x.shape == (3 * 10 * 14,)

    rows = [("gv", "video", bytearray(data), None, None, None, 3)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feat = multimodal.media_features(media, mode="real").collect()[0]
    assert feat.n_samples == len(x)
    assert feat.rms_mean == pytest.approx(K.rms_stats(x)[0], rel=1e-12)


def test_rec_list_interleaved_avi():
    """Canonical interleaved AVIs wrap frame chunks in nested 'rec '
    LISTs — the parser must recurse and find every frame."""
    frames = _frames(n=4)
    plain = video.decode_frames(video.encode_avi_mjpeg(frames))
    rec = video.decode_frames(
        video.encode_avi_mjpeg(frames, rec_lists=True))
    assert len(rec) == 4
    for a, b in zip(plain, rec):
        np.testing.assert_array_equal(a, b)
