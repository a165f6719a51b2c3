"""Preprocessing numerics vs the reference pipeline (ref dataset.py:37-73)."""

import numpy as np
import pytest
from PIL import Image

import discogan_modernized_tpu.data.preprocess as pp
from discogan_modernized_tpu.data.preprocess import (
    read_images,
    decode_image,
    shuffle_data,
    preprocess_array,
)

cv2 = pytest.importorskip("cv2")


def _make_ab_image(tmp_path, name="ab.jpg", seed=0):
    """A 256x512 pix2pix-style AB image (edges left, photo right)."""
    rng = np.random.RandomState(seed)
    img = (rng.rand(256, 512, 3) * 255).astype(np.uint8)
    path = tmp_path / name
    Image.fromarray(img).save(path, quality=95)
    return path


def _reference_decode(path, domain, image_size):
    """The reference read_images body, verbatim semantics (CHW output)."""
    image = np.array(Image.open(path).convert("RGB"))
    if domain == "A":
        kernel = np.ones((3, 3), np.uint8)
        image = image[:, :256, :]
        image = 255.0 - image
        image = cv2.dilate(image, kernel, iterations=1)
        image = 255.0 - image
    elif domain == "B":
        image = image[:, 256:, :]
    image = cv2.resize(image, (image_size, image_size))
    image = image.astype(np.float32) / 255.0
    return image.transpose(2, 0, 1)


@pytest.mark.parametrize("domain", ["A", "B", None])
def test_decode_matches_reference(tmp_path, domain):
    path = _make_ab_image(tmp_path)
    ref = _reference_decode(path, domain, 64)  # CHW
    ours = decode_image(path, domain, 64)      # HWC
    np.testing.assert_array_equal(ours.transpose(2, 0, 1), ref)


def test_read_images_skips_bad_files(tmp_path):
    good = _make_ab_image(tmp_path)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not an image")
    out = read_images([str(good), str(bad), str(good)], "B", 32)
    assert out.shape == (2, 32, 32, 3)


def test_numpy_dilate_matches_cv2():
    rng = np.random.RandomState(3)
    img = rng.rand(40, 40, 3) * 255.0
    ref = cv2.dilate(img, np.ones((3, 3), np.uint8), iterations=1)
    real = pp.HAVE_CV2
    try:
        pp.HAVE_CV2 = False
        ours = pp._dilate3x3(img)
    finally:
        pp.HAVE_CV2 = real
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_numpy_resize_close_to_cv2():
    rng = np.random.RandomState(4)
    img = rng.rand(100, 80, 3) * 255.0
    ref = cv2.resize(img, (64, 64))
    real = pp.HAVE_CV2
    try:
        pp.HAVE_CV2 = False
        ours = pp._resize(img, 64)
    finally:
        pp.HAVE_CV2 = real
    # cv2 float path is exact bilinear; allow tiny fp slack.
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_shuffle_data_is_independent_permutation():
    np.random.seed(0)
    a = np.arange(100)
    b = np.arange(100, 200)
    sa, sb = shuffle_data(a, b)
    assert sorted(sa) == list(a) and sorted(sb) == list(b)
    assert not (np.array_equal(sa, a) and np.array_equal(sb, b))


def test_preprocess_array_output_range():
    rng = np.random.RandomState(5)
    img = (rng.rand(256, 512, 3) * 255).astype(np.uint8)
    out = preprocess_array(img, "A", 32)
    assert out.dtype == np.float32
    assert out.shape == (32, 32, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0
