"""Native C++ frame loader: build, parity with the PIL path, batch API."""

import os
import tempfile

import numpy as np
import pytest
from PIL import Image

from forge_tpu.data import native_io
from forge_tpu.data.base import load_rgba_frame


@pytest.fixture(scope="module")
def png_path():
    rng = np.random.RandomState(0)
    arr = (rng.rand(100, 100, 4) * 255).astype(np.uint8)
    arr[..., 3] = (rng.rand(100, 100) > 0.4).astype(np.uint8) * 255
    d = tempfile.mkdtemp()
    p = os.path.join(d, "frame.png")
    Image.fromarray(arr, "RGBA").save(p)
    return p


def test_native_build_and_parity(png_path):
    if not native_io.available():
        pytest.skip("native toolchain unavailable")
    for mask_images in (False, True):
        out = native_io.load_frame(png_path, 48, mask_images)
        assert out is not None
        rgb_n, mask_n = out
        rgb_p, mask_p = load_rgba_frame(png_path, 48, mask_images)
        # masks are exact (nearest); rgb within resize-implementation tolerance
        # (PIL resizes in uint8 fixed point; forge_io in float32)
        assert np.array_equal(mask_n, mask_p)
        assert np.abs(rgb_n - rgb_p).max() < 0.1
        assert np.abs(rgb_n - rgb_p).mean() < 0.01


def test_native_batch(png_path):
    if not native_io.available():
        pytest.skip("native toolchain unavailable")
    out = native_io.load_batch([png_path] * 4, 32, False, n_threads=2)
    assert out is not None
    rgb, mask = out
    assert rgb.shape == (4, 32, 32, 3)
    assert mask.shape == (4, 32, 32, 1)
    # all frames identical input -> identical output
    for i in range(1, 4):
        np.testing.assert_array_equal(rgb[0], rgb[i])


def test_native_missing_file():
    if not native_io.available():
        pytest.skip("native toolchain unavailable")
    assert native_io.load_frame("/nonexistent/x.png", 32, False) is None
