"""BMP decoder: round trip, external-fixture validation, cross-codec
agreement, dispatch."""

import os

import numpy as np
import pytest

from photohive_spark import bmp, png

_SYS = "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11"


def test_roundtrip_24bit():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    np.testing.assert_array_equal(bmp.decode_bmp(bmp.encode_bmp(img)), img)
    gray = rng.integers(0, 256, (5, 7), dtype=np.uint8)
    out = bmp.decode_bmp(bmp.encode_bmp(gray))
    np.testing.assert_array_equal(out[:, :, 0], gray)


def test_external_bmp_bitfields_agrees_with_png():
    """CPython's python.bmp is 32bpp BI_BITFIELDS (V5 header) of the
    same logo as python.png — the two independent decoders must agree
    exactly on RGB."""
    bp = f"{_SYS}/test/imghdrdata/python.bmp"
    pp = f"{_SYS}/test/imghdrdata/python.png"
    if not (os.path.exists(bp) and os.path.exists(pp)):
        pytest.skip("system files absent")
    b = bmp.decode_bmp(open(bp, "rb").read()).astype(int)
    p = png.decode_png(open(pp, "rb").read())[:, :, :3].astype(int)
    assert b.shape == p.shape
    assert np.abs(b - p).max() <= 1      # bitfield scaling slack


def test_error_paths_and_dispatch():
    with pytest.raises(ValueError, match="BM"):
        bmp.decode_bmp(b"nope")
    img = np.full((4, 4, 3), 77, dtype=np.uint8)
    data = bmp.encode_bmp(img)
    p = png.decode_image_rgb(data)       # magic-byte dispatch
    assert (p["height"], p["width"]) == (4, 4)
    np.testing.assert_allclose(p["r"], 77 / 255.0)
    # RLE rejected loudly
    bad = bytearray(data)
    bad[30] = 1                          # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        bmp.decode_bmp(bytes(bad))
