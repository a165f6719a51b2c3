"""Paired (vmapped A/B-side) graph must equal the plain graph numerically."""

import numpy as np

import jax
import jax.numpy as jnp

from discogan_modernized_tpu.core.precision import F32
from discogan_modernized_tpu.train import TrainConfig, init_train_state, make_train_steps


def test_paired_graph_equals_plain_graph():
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
    B = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))

    results = {}
    for paired in (False, True):
        cfg = TrainConfig(image_size=16, precision="f32", paired=paired)
        ts = init_train_state(jax.random.PRNGKey(0), cfg)
        gen_step, dis_step = make_train_steps(cfg, F32)
        ts, _ = dis_step(ts, A, B, jnp.float32(0.01))
        ts, losses = gen_step(ts, A, B, jnp.float32(0.01))
        results[paired] = ({k: float(v) for k, v in losses.items()},
                           jax.tree.leaves(ts["models"]))

    for k in results[False][0]:
        assert abs(results[False][0][k] - results[True][0][k]) < 1e-5, k
    # One D + one G step: params equal to fp-reorder noise (before Adam's
    # sign amplification compounds).
    diffs = np.concatenate([
        np.abs(np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(results[False][1], results[True][1])
    ])
    assert float(np.quantile(diffs, 0.999)) < 1e-5
    assert float(diffs.max()) < 5e-4


def test_paired_with_angle_variant_and_remat():
    """paired composes with skip_first_fm and remat."""
    rng = np.random.RandomState(1)
    A = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    B = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    cfg = TrainConfig(image_size=16, precision="f32", paired=True,
                      skip_first_fm=True, remat=True)
    ts = init_train_state(jax.random.PRNGKey(2), cfg)
    gen_step, dis_step = make_train_steps(cfg, F32)
    ts, _ = dis_step(ts, A, B, jnp.float32(0.9))
    ts, losses = gen_step(ts, A, B, jnp.float32(0.9))
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
