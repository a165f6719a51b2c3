"""Correctness of the halo-tiled Pallas conv (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import pytest

from discogan_modernized_tpu.ops.pallas_halo_conv import (
    halo_conv2d_k4s2p1, halo_conv2d_k4s2p1_dw)

DN = ("NHWC", "HWIO", "NHWC")


def ref_conv(x, w):
    return lax.conv_general_dilated(x, w, (2, 2), [(1, 1), (1, 1)],
                                    dimension_numbers=DN)


@pytest.mark.parametrize("n,h,w_,ci,co", [
    (2, 16, 16, 8, 16),
    (1, 32, 32, 64, 128),   # enc1 geometry (scaled down spatially)
    (2, 64, 32, 16, 8),     # multiple row tiles, non-square
    (1, 8, 8, 8, 8),        # single tile
])
def test_halo_conv_fwd_matches_ref(n, h, w_, ci, co):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w_, ci), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, ci, co) * 0.1, jnp.float32)
    y = halo_conv2d_k4s2p1(x, w, interpret=True)
    ref = ref_conv(x, w)
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_halo_conv_fused_epilogue():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, 8, 16) * 0.1, jnp.float32)
    sc = jnp.asarray(rng.rand(16), jnp.float32)
    of = jnp.asarray(rng.randn(16), jnp.float32)
    y = halo_conv2d_k4s2p1(x, w, scale=sc, offset=of, act="leaky",
                           interpret=True)
    ref = ref_conv(x, w) * sc + of
    ref = jnp.where(ref >= 0, ref, 0.2 * ref)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("n,h,w_,ci,co", [
    (2, 16, 16, 8, 16),
    (1, 32, 32, 64, 128),
    (2, 64, 32, 16, 8),
])
def test_halo_conv_dw_matches_ref(n, h, w_, ci, co):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(n, h, w_, ci), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, ci, co) * 0.1, jnp.float32)
    dy = jnp.asarray(rng.randn(n, h // 2, w_ // 2, co), jnp.float32)
    dw = halo_conv2d_k4s2p1_dw(x, dy, interpret=True)
    _, vjp = jax.vjp(lambda w_: ref_conv(x, w_), w)
    ref = vjp(dy)[0]
    assert dw.shape == ref.shape
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
