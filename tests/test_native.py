"""Native image codec: build, correctness vs PIL / numpy."""

import io

import numpy as np
import pytest

from diffusionspatialcontrol_tpu.runtime import native


def test_native_builds():
    assert native.available(), "native lib failed to build"


def test_tensor_to_u8_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.uniform(-1.3, 1.3, (2, 37, 41, 3)).astype(np.float32)
    got = native.tensor_to_u8(x)
    want = ((np.clip(x * 0.5 + 0.5, 0.0, 1.0) * 255.0) + 0.5).astype(
        np.uint8
    )
    np.testing.assert_array_equal(got, want)


def test_png_roundtrip():
    from PIL import Image

    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (33, 47, 3), np.uint8)
    png = native.encode_png(img)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    decoded = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
    np.testing.assert_array_equal(decoded, img)


def test_make_grid():
    imgs = np.stack(
        [np.full((4, 4, 3), i, np.uint8) for i in range(5)]
    )
    grid = native.make_grid(imgs, cols=3)
    assert grid.shape == (8, 12, 3)
    assert (grid[:4, :4] == 0).all()
    assert (grid[4:8, 4:8] == 4).all()
    assert (grid[4:, 8:] == 0).all()  # padding cell
