"""Pallas fused BN kernels vs the reference math (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from discogan_modernized_tpu.ops import pallas_fused as pf

if not pf.HAVE_PALLAS:  # pragma: no cover
    pytest.skip("pallas unavailable", allow_module_level=True)

rng = np.random.RandomState(0)


def test_batch_stats_matches_numpy():
    x = rng.randn(4, 8, 8, 128).astype(np.float32)
    mean, var = pf.batch_stats(jnp.asarray(x), tile_rows=64, interpret=True)
    ref_mean = x.reshape(-1, 128).mean(0)
    ref_var = x.reshape(-1, 128).var(0)
    np.testing.assert_allclose(np.asarray(mean), ref_mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), ref_var, atol=1e-5)


def test_batch_stats_ragged_rows():
    """Row count not a multiple of the tile (padding path)."""
    x = rng.randn(3, 5, 5, 128).astype(np.float32)  # 75 rows
    mean, var = pf.batch_stats(jnp.asarray(x), tile_rows=32, interpret=True)
    np.testing.assert_allclose(np.asarray(mean), x.reshape(-1, 128).mean(0),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), x.reshape(-1, 128).var(0),
                               atol=1e-5)


@pytest.mark.parametrize("act", ["leaky_relu", "relu", "none"])
def test_fused_bn_act_matches_reference_math(act):
    c = 128
    x = rng.randn(2, 8, 8, c).astype(np.float32)
    mean = rng.randn(c).astype(np.float32) * 0.1
    var = (rng.rand(c).astype(np.float32) + 0.5)
    scale = rng.rand(c).astype(np.float32) + 0.5
    bias = rng.randn(c).astype(np.float32) * 0.1

    y = pf.fused_batchnorm_act(
        jnp.asarray(x), jnp.asarray(mean), jnp.asarray(var),
        jnp.asarray(scale), jnp.asarray(bias), act=act, tile_rows=32,
        interpret=True)

    ref = (x - mean) / np.sqrt(var + 1e-5) * scale + bias
    if act == "leaky_relu":
        ref = np.where(ref >= 0, ref, ref * 0.2)
    elif act == "relu":
        ref = np.maximum(ref, 0)
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-5, rtol=1e-5)


def test_fused_bn_act_equals_batchnorm_apply_plus_activation():
    """Drop-in equivalence with the production eval-mode path."""
    from discogan_modernized_tpu.ops.batchnorm import batchnorm_init, batchnorm_apply
    from discogan_modernized_tpu.ops.activations import leaky_relu

    c = 128
    x = rng.randn(2, 4, 4, c).astype(np.float32)
    params, state = batchnorm_init(c)
    state = dict(state, mean=jnp.asarray(rng.randn(c), jnp.float32) * 0.1,
                 var=jnp.asarray(rng.rand(c) + 0.5, jnp.float32))

    ref, _ = batchnorm_apply(params, state, jnp.asarray(x), training=False)
    ref = leaky_relu(ref, 0.2)
    y = pf.fused_batchnorm_act(
        jnp.asarray(x), state["mean"], state["var"], params["scale"],
        params["bias"], act="leaky_relu", tile_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)
