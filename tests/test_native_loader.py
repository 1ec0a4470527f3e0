"""Tests for the native C++ batched image loader (native/loader.cc)."""

import numpy as np
import pytest
from PIL import Image

from alink_tpu.data import native_loader
from alink_tpu.data.loader import load_image_list

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built"
)


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, ext in enumerate(["jpg", "png", "jpg", "png"]):
        arr = rng.integers(0, 255, (40 + 4 * i, 30 + 2 * i, 3),
                           dtype=np.uint8)
        p = str(d / f"img_{i}.{ext}")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def test_decode_shapes_and_range(image_files):
    out, failures = native_loader.decode_resize_batch(image_files, (16, 24))
    assert failures == 0
    assert out.shape == (4, 24, 16, 3)  # (w, h) convention -> (n, h, w, 3)
    assert out.min() >= 0.0 and out.max() <= 255.0
    assert out.std() > 1.0  # real pixel content, not zeros


def test_png_decode_matches_pil(image_files):
    """Lossless PNG at native size must match PIL exactly; resize agrees
    with the cv2-style half-pixel grid within rounding."""
    png = [p for p in image_files if p.endswith(".png")][0]
    with Image.open(png) as im:
        w, h = im.size
        ref = np.asarray(im.convert("RGB"), np.float32)
    out, failures = native_loader.decode_resize_batch([png], (w, h))
    assert failures == 0
    np.testing.assert_allclose(out[0], ref, atol=0.51)


def test_jpeg_decode_close_to_pil(image_files):
    """JPEG decoders may differ by small IDCT rounding; stay close."""
    jpg = [p for p in image_files if p.endswith(".jpg")][0]
    with Image.open(jpg) as im:
        w, h = im.size
        ref = np.asarray(im.convert("RGB"), np.float32)
    out, _ = native_loader.decode_resize_batch([jpg], (w, h))
    assert np.mean(np.abs(out[0] - ref)) < 2.0


def test_missing_file_zero_filled(image_files, tmp_path):
    paths = [image_files[0], str(tmp_path / "nope.jpg")]
    out, failures = native_loader.decode_resize_batch(paths, (8, 8))
    assert failures == 1
    assert out[1].sum() == 0.0
    assert out[0].sum() > 0.0


def test_loader_backend_integration(image_files):
    native = load_image_list(image_files, (12, 12), backend="native")
    pil = load_image_list(image_files, (12, 12), backend="pil")
    assert native.shape == pil.shape == (4, 12, 12, 3)
    # Different resize kernels (PIL vs cv2-style) but same content scale.
    assert abs(float(native.mean()) - float(pil.mean())) < 8.0


def test_dct_scale_identical_when_not_engaged(image_files):
    """Sources smaller than 2x the target decode at scale 1 — the fast
    path must then be bit-identical to the exact path.  (Target height
    27 > half of every fixture's 40-52 px height, so no source
    engages.)"""
    exact, _ = native_loader.decode_resize_batch(image_files, (20, 27))
    fast, _ = native_loader.decode_resize_batch(image_files, (20, 27),
                                                dct_scale=True)
    np.testing.assert_array_equal(exact, fast)


def test_dct_scale_approximates_large_jpeg(tmp_path):
    """On a >=4x source the scaled decode engages: pixels are a close
    approximation (box-filtered DCT downscale), never garbage, and PNGs
    (no libjpeg path) stay bit-exact."""
    rng = np.random.default_rng(3)
    base = rng.normal(128, 40, (24, 24, 3)).clip(0, 255).astype(np.uint8)
    big = np.asarray(Image.fromarray(base).resize((640, 512),
                                                  Image.BILINEAR))
    jpg = str(tmp_path / "big.jpg")
    png = str(tmp_path / "big.png")
    Image.fromarray(big).save(jpg, quality=92)
    Image.fromarray(big).save(png)
    exact, _ = native_loader.decode_resize_batch([jpg, png], (80, 64))
    fast, _ = native_loader.decode_resize_batch([jpg, png], (80, 64),
                                                dct_scale=True)
    # JPEG slot: approximate but close on a smooth image.
    assert np.abs(exact[0] - fast[0]).mean() < 3.0
    assert np.abs(exact[0] - fast[0]).max() < 40.0
    assert not np.array_equal(exact[0], fast[0])  # it DID engage
    # PNG slot: unchanged.
    np.testing.assert_array_equal(exact[1], fast[1])


def test_dct_scale_never_upscales_tiny_sources(tmp_path):
    """A source below the target must still decode at full scale (the
    denom loop bottoms out at 1) and match the exact path."""
    rng = np.random.default_rng(4)
    small = rng.integers(0, 255, (20, 18, 3), dtype=np.uint8)
    p = str(tmp_path / "small.jpg")
    Image.fromarray(small).save(p, quality=92)
    exact, _ = native_loader.decode_resize_batch([p], (64, 64))
    fast, _ = native_loader.decode_resize_batch([p], (64, 64),
                                                dct_scale=True)
    np.testing.assert_array_equal(exact, fast)
