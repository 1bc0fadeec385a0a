"""Round-trip tests for the dependency-free image I/O (io/image.py)."""

import numpy as np

from stratum_tpu.io import image as sio


def test_png_roundtrip(tmp_path, rng_np):
    img = (rng_np.random((13, 17, 3)) * 255).astype(np.uint8)
    p = tmp_path / "t.png"
    sio.write_png(p, img)
    back = sio.read_png(p)
    np.testing.assert_array_equal(back, img)


def test_png_from_float(tmp_path):
    img = np.linspace(0, 1, 8 * 8 * 3, dtype=np.float32).reshape(8, 8, 3)
    p = tmp_path / "t.png"
    sio.write_png(p, img)
    back = sio.read_png(p)
    np.testing.assert_allclose(back / 255.0, img, atol=1 / 255.0 + 1e-6)


def test_hdr_roundtrip(tmp_path, rng_np):
    img = (rng_np.random((9, 11, 3)) * 40.0).astype(np.float32)
    img[0, 0] = 0.0
    p = tmp_path / "t.hdr"
    sio.write_hdr(p, img)
    back = sio.read_hdr(p)
    # RGBE precision: +-0.5 ULP of the shared 8-bit mantissa, i.e. relative
    # to the per-pixel max channel
    bound = img.max(axis=-1, keepdims=True) / 256.0 + 1e-4
    assert (np.abs(back - img) <= bound).all()


def test_pfm_roundtrip(tmp_path, rng_np):
    img = rng_np.random((5, 7, 3)).astype(np.float32)
    p = tmp_path / "t.pfm"
    sio.write_pfm(p, img)
    np.testing.assert_array_equal(sio.read_pfm(p), img)
