"""Correctness of the Pallas head-convT kernel (interpret mode on CPU).

Reference: lax.conv_general_dilated's zero-dilated convT — the same
oracle the subpixel decomposition is tested against (test_ops).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import pytest

from discogan_modernized_tpu.ops.pallas_head import head_convt_fwd

DN = ("NHWC", "HWIO", "NHWC")


def ref_convt(x, w):
    wf = w[::-1, ::-1, :, :]
    return lax.conv_general_dilated(
        x, wf, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=DN)


@pytest.mark.parametrize("layout", ["flat6", "kmajor"])
@pytest.mark.parametrize("n,h,w_,ci,co", [
    (2, 16, 16, 8, 3),     # tiny
    (1, 32, 32, 64, 3),    # 64px-geometry head shape
    (2, 8, 8, 16, 1),      # single out channel
    (1, 40, 24, 8, 3),     # non-square, multi-tile rows
    (3, 64, 32, 8, 2),     # multiple row tiles (nt=2)
])
def test_head_convt_fwd_matches_ref(n, h, w_, ci, co, layout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w_, ci), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, ci, co) * 0.1, jnp.float32)
    y = head_convt_fwd(x, w, layout=layout, interpret=True)
    ref = ref_convt(x, w)
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("layout", ["flat6", "kmajor"])
def test_head_convt_fwd_matches_subpixel_bf16(layout):
    from discogan_modernized_tpu.ops.conv import _conv_transpose_subpixel
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 32, 32, 16), jnp.bfloat16)
    w = jnp.asarray(rng.randn(4, 4, 16, 3) * 0.1, jnp.bfloat16)
    y = head_convt_fwd(x, w, layout=layout, interpret=True)
    ref = _conv_transpose_subpixel(x, w)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)
