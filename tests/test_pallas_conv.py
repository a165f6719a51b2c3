"""Blocked Pallas k4/s2/p1 conv (ops/pallas_conv.py) vs XLA's emitter.

Interpret-mode on CPU for the suite; the compiled path gets automated
coverage from bench.py's pallas_selfcheck (runs every bench invocation
on the real backend) and continuous numbers from
tools/conv_kernel_bench.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from discogan_modernized_tpu.ops.pallas_conv import (
    conv2d_k4s2p1, conv2d_k4s2p1_dw)

DN = ("NHWC", "HWIO", "NHWC")


def _ref_conv(x, w):
    return lax.conv_general_dilated(x, w, (2, 2), [(1, 1), (1, 1)],
                                    dimension_numbers=DN)


@pytest.mark.parametrize("shape", [
    (4, 16, 64, 128),   # mid layer
    (2, 32, 3, 64),     # 3-channel boundary (single odd-width tile)
    (8, 4, 512, 1024),  # late layer: batch tiling carries the MXU M dim
    (3, 8, 100, 64),    # non-128-divisible channels fall back to one tile
])
def test_forward_matches_xla(shape):
    n, h, ci, co = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, h, ci), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, ci, co) * 0.05, jnp.float32)
    ref = _ref_conv(x, w)
    y = conv2d_k4s2p1(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_epilogue_and_stats():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 16, 16, 64), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, 64, 128) * 0.05, jnp.float32)
    ref = _ref_conv(x, w)
    s = jnp.asarray(rng.rand(128), jnp.float32)
    b = jnp.asarray(rng.randn(128), jnp.float32)

    y = conv2d_k4s2p1(x, w, scale=s, offset=b, act="leaky", interpret=True)
    want = ref * s + b
    want = jnp.where(want >= 0, want, 0.2 * want)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               atol=1e-4, rtol=1e-4)

    y2, (mean, meansq) = conv2d_k4s2p1(x, w, with_stats=True, interpret=True)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(mean),
                               np.asarray(ref.mean((0, 1, 2))), atol=1e-4)
    np.testing.assert_allclose(np.asarray(meansq),
                               np.asarray((ref ** 2).mean((0, 1, 2))),
                               atol=1e-4)


def test_dw_matches_xla_vjp():
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(4, 4, 64, 128) * 0.05, jnp.float32)
    x = jnp.asarray(rng.randn(4, 16, 16, 64) * 0.1, jnp.float32)
    dy = jnp.asarray(rng.randn(4, 8, 8, 128), jnp.float32)
    _, vjp = jax.vjp(lambda w_: _ref_conv(x, w_), w)
    dw_ref, = vjp(dy)
    dw = conv2d_k4s2p1_dw(x, dy, interpret=True)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               atol=1e-3, rtol=1e-4)
