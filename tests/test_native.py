"""Native C++ preprocessing library vs the cv2/python reference numerics."""

import numpy as np
import pytest

native = pytest.importorskip("discogan_modernized_tpu.data.native")

if not native.available():  # pragma: no cover
    pytest.skip("native toolchain unavailable", allow_module_level=True)

cv2 = pytest.importorskip("cv2")

rng = np.random.RandomState(0)


def test_dilate_matches_cv2_exactly():
    img = (rng.rand(50, 60, 3) * 255).astype(np.float32)
    ref = cv2.dilate(img, np.ones((3, 3), np.uint8), iterations=1)
    np.testing.assert_array_equal(native.dilate3x3(img), ref)


def test_erode_equals_reference_invert_dilate_invert():
    """255 - dilate(255 - x) == erode(x): the reference edge-thickening op."""
    img = (rng.rand(50, 60, 3) * 255).astype(np.float64)
    ref = 255.0 - cv2.dilate(255.0 - img, np.ones((3, 3), np.uint8), iterations=1)
    ours = native.erode3x3(img.astype(np.float32))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_resize_matches_cv2_float_path():
    img = (rng.rand(100, 80, 3) * 255).astype(np.float32)
    ref = cv2.resize(img, (64, 64))  # float input -> cv2 float bilinear
    ours = native.resize_bilinear(img, 64)
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-6)


@pytest.mark.parametrize("domain", [None, "B"])
def test_fused_preprocess_close_to_reference_uint8(domain):
    """uint8 path: cv2 resize uses fixed-point coefficients, the native
    path exact float bilinear — within 1 LSB of the 8-bit scale."""
    from discogan_modernized_tpu.data.preprocess import preprocess_array

    img = (rng.rand(256, 512, 3) * 255).astype(np.uint8)
    ref = preprocess_array(img.copy(), domain, 64)  # cv2 path
    ours = native.preprocess(img, domain, 64)
    assert ours.shape == ref.shape == (64, 64, 3)
    np.testing.assert_allclose(ours, ref, atol=1.5 / 255.0)


def test_fused_preprocess_domain_A_edge_numerics():
    from discogan_modernized_tpu.data.preprocess import preprocess_array

    img = (rng.rand(256, 512, 3) * 255).astype(np.uint8)
    ref = preprocess_array(img.copy(), "A", 64)  # float64 invert->dilate path
    ours = native.preprocess(img, "A", 64)
    # Domain A flows through cv2's float path in the reference, so the
    # native result is numerically tight.
    np.testing.assert_allclose(ours, ref, atol=1e-5)
