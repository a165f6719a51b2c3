"""Learning dynamics: the trainer must actually learn, not just run.

With a high reconstruction weight, 150 alternating updates on a small
fixed dataset must drive the cycle-reconstruction losses well below their
initial values. Catches sign/coupling errors that shape tests can't.
"""

import numpy as np

import jax
import jax.numpy as jnp

from discogan_modernized_tpu.core.precision import F32
from discogan_modernized_tpu.train import TrainConfig, init_train_state, make_train_steps


def test_reconstruction_loss_decreases():
    cfg = TrainConfig(image_size=16, precision="f32",
                      starting_rate=0.9, default_rate=0.9,
                      learning_rate=5e-4)
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    gen_step, dis_step = make_train_steps(cfg, F32)

    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.rand(8, 16, 16, 3).astype(np.float32))
    B = jnp.asarray(rng.rand(8, 16, 16, 3).astype(np.float32))

    first = None
    last = None
    for i in range(150):
        step = dis_step if cfg.is_dis_iter(i) else gen_step
        ts, losses = step(ts, A, B, jnp.float32(cfg.rate_for(i)))
        recon = float(losses["recon_A"]) + float(losses["recon_B"])
        if first is None:
            first = recon
        last = recon
    assert np.isfinite(last)
    assert last < first * 0.5, f"recon did not learn: {first} -> {last}"
