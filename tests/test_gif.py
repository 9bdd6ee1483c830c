"""GIF codec: LZW round trips (dictionary growth, table-full clears,
interlace, animation + disposal), validation against real GIFs from
external encoders, three-codec agreement on the shared CPython logo,
and the Spark media pipeline dispatch."""

import os

import numpy as np
import pytest

from photohive_spark import gif, multimodal, png

_SYS = "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11"
_EXTERNAL = [
    f"{_SYS}/test/imghdrdata/python.gif",
    f"{_SYS}/idlelib/Icons/python.gif",
    "/usr/share/doc/libxslt1-dev/html/Libxslt-Logo-180x168.gif",
]


def test_lzw_roundtrip_small_palette():
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 4, (17, 23), dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                   dtype=np.uint8)
    out = gif.decode_gif(gif.encode_gif(idx, palette=pal))
    assert (out["width"], out["height"]) == (23, 17)
    np.testing.assert_array_equal(out["frames"][0], pal[idx])


def test_lzw_dictionary_growth_and_clear():
    """A large noisy 256-color frame forces code width growth to 12 bits
    and at least one table-full CLEAR mid-stream."""
    rng = np.random.default_rng(2)
    idx = rng.integers(0, 256, (64, 200), dtype=np.uint8)
    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    out = gif.decode_gif(gif.encode_gif(idx, palette=pal))
    np.testing.assert_array_equal(out["frames"][0], pal[idx])


@pytest.mark.parametrize("interlace", [False, True])
def test_gradient_roundtrip(interlace):
    y, x = np.mgrid[0:33, 0:21]
    idx = ((x + y) % 6).astype(np.uint8)
    pal = (np.arange(6)[:, None] * np.array([40, 30, 20])).astype(np.uint8)
    out = gif.decode_gif(gif.encode_gif(idx, palette=pal,
                                        interlace=interlace))
    np.testing.assert_array_equal(out["frames"][0], pal[idx])


def test_animation_frames():
    rng = np.random.default_rng(3)
    pal = np.array([[0, 0, 0], [80, 80, 80], [160, 160, 160],
                    [240, 240, 240]], dtype=np.uint8)
    frames = [rng.integers(0, 4, (12, 16), dtype=np.uint8)
              for _ in range(4)]
    data = gif.encode_gif(frames, palette=pal, durations_ms=[50] * 4)
    out = gif.decode_gif(data)
    assert len(out["frames"]) == 4
    assert out["durations_ms"] == [50] * 4
    for f, want in zip(out["frames"], frames):
        np.testing.assert_array_equal(f, pal[want])


@pytest.mark.parametrize("path", [
    pytest.param(p, marks=pytest.mark.skipif(
        not os.path.exists(p), reason="system file absent"))
    for p in _EXTERNAL])
def test_decode_external_gifs(path):
    """Real GIFs from external encoders — plausible pixels, not
    garbage."""
    out = gif.decode_gif(open(path, "rb").read())
    f = out["frames"][0]
    assert f.shape == (out["height"], out["width"], 3)
    assert 3.0 < float(f.mean()) < 252.0


def test_three_codec_agreement():
    """imghdrdata ships the SAME logo as python.{png,jpg,gif}: all three
    independent decoders must agree (GIF within palette-quantization
    error, JPEG within lossy error)."""
    pp = f"{_SYS}/test/imghdrdata/python.png"
    gp = f"{_SYS}/test/imghdrdata/python.gif"
    if not (os.path.exists(pp) and os.path.exists(gp)):
        pytest.skip("system files absent")
    p = png.decode_png(open(pp, "rb").read())[:, :, :3].astype(float)
    g = gif.decode_gif(open(gp, "rb").read())["frames"][0].astype(float)
    assert g.shape == p.shape
    assert np.abs(g - p).mean() < 30.0


def test_error_paths():
    with pytest.raises(ValueError, match="signature"):
        gif.decode_gif(b"NOT A GIF")
    good = bytearray(gif.encode_gif(
        np.zeros((4, 4), dtype=np.uint8),
        palette=np.zeros((4, 3), dtype=np.uint8)))
    with pytest.raises(ValueError):
        gif.decode_gif(bytes(good[:20]))    # truncated mid-stream


def test_dispatch_and_spark_pipeline(spark):
    """decode_image_rgb sniffs GIF; media_features and image_report
    process GIF payloads end-to-end with mode='real'."""
    from photohive_spark import kernels as K

    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (20, 24), dtype=np.uint8)
    data = gif.encode_gif(idx, palette=pal)
    p = png.decode_image_rgb(data)
    assert (p["height"], p["width"]) == (20, 24)
    np.testing.assert_array_equal(
        np.rint(p["r"] * 255).astype(np.uint8), pal[idx][:, :, 0])

    rows = [("g0", "image", bytearray(data), 24, 20, None, None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    rep = multimodal.image_report(media, mode="real").collect()[0]
    assert (rep.height, rep.width) == (20, 24)
    gray = K.rgb2pgm(p["r"], p["g"], p["b"])
    assert rep.rms_mean == pytest.approx(
        K.rms_stats(gray.reshape(-1))[0], rel=1e-12)


def test_lzw_property_roundtrip():
    """Hypothesis-style property sweep (seeded, deterministic): random
    index streams across palette sizes, shapes and interlace must
    round-trip exactly — covering width growth timing, KwKwK chains,
    run-heavy streams (long repeats) and table-full clears."""
    rng = np.random.default_rng(99)
    for trial in range(25):
        bits = int(rng.integers(1, 9))          # palette 2..256 colors
        n_col = 1 << bits
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        style = trial % 3
        if style == 0:                           # uniform random
            idx = rng.integers(0, n_col, (h, w), dtype=np.uint8)
        elif style == 1:                         # run-heavy (repeats)
            runs = rng.integers(0, n_col, max(1, h * w // 7) + 1)
            idx = np.repeat(runs, 7)[:h * w].reshape(h, w).astype(np.uint8)
        else:                                    # KwKwK-inducing pattern
            idx = (np.arange(h * w) % min(3, n_col)) \
                .reshape(h, w).astype(np.uint8)
        pal = rng.integers(0, 256, (n_col, 3), dtype=np.uint8)
        data = gif.encode_gif(idx, palette=pal,
                              interlace=bool(trial % 2))
        out = gif.decode_gif(data)
        np.testing.assert_array_equal(out["frames"][0], pal[idx],
                                      err_msg=f"trial {trial}")
