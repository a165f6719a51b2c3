"""Data-parallel SPMD tests on the 8-virtual-CPU-device mesh.

The reference could not test its distributed path without GPUs (backend
hardcoded "nccl"); here sync-BN DP must be step-for-step equal to
single-device training on the same global batch, and local-BN (DDP-faithful)
mode must keep parameters replica-consistent.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from discogan_modernized_tpu.core.mesh import make_mesh, DATA_AXIS
from discogan_modernized_tpu.core.precision import F32
from discogan_modernized_tpu.train import TrainConfig, init_train_state, make_train_steps
from discogan_modernized_tpu.parallel import (
    make_dp_train_steps,
    replicate_train_state,
    unreplicate_train_state,
)

IMAGE_SIZE = 16
GLOBAL_BATCH = 16
N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= N_DEV, "conftest must provide 8 CPU devices"
    return make_mesh(N_DEV)


def _data(n_steps, seed=0):
    rng = np.random.RandomState(seed)
    return [
        (rng.rand(GLOBAL_BATCH, IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32),
         rng.rand(GLOBAL_BATCH, IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32))
        for _ in range(n_steps)
    ]


def test_sync_dp_equals_single_device(mesh):
    cfg = TrainConfig(image_size=IMAGE_SIZE, precision="f32", bn_sync=True,
                      gan_curriculum=2, starting_rate=0.01, default_rate=0.5)
    data = _data(5)

    # Single device trajectory.
    ts1 = init_train_state(jax.random.PRNGKey(0), cfg)
    gen1, dis1 = make_train_steps(cfg, F32)
    log1 = []
    for it, (A, B) in enumerate(data):
        step = dis1 if cfg.is_dis_iter(it) else gen1
        ts1, losses = step(ts1, jnp.asarray(A), jnp.asarray(B),
                           jnp.float32(cfg.rate_for(it)))
        log1.append({k: float(v) for k, v in losses.items()})

    # 8-way DP trajectory on the same global batches.
    ts8 = init_train_state(jax.random.PRNGKey(0), cfg)
    ts8 = replicate_train_state(ts8, mesh, cfg)
    gen8, dis8 = make_dp_train_steps(cfg, mesh)
    log8 = []
    for it, (A, B) in enumerate(data):
        step = dis8 if cfg.is_dis_iter(it) else gen8
        ts8, losses = step(ts8, jnp.asarray(A), jnp.asarray(B),
                           jnp.float32(cfg.rate_for(it)))
        log8.append({k: float(v) for k, v in losses.items()})

    # Reduction-order fp noise (pmean of 8 local means vs one global mean)
    # gets amplified by Adam's ~±lr*sign(g) first-step updates on near-zero
    # gradient elements, so equality is statistical, not bitwise — same
    # bounds as the torch-trajectory gate.
    for i, (l1, l8) in enumerate(zip(log1, log8)):
        for k in l1:
            assert abs(l1[k] - l8[k]) < 1e-3, f"step {i} {k}: {l1[k]} vs {l8[k]}"

    ts8 = unreplicate_train_state(ts8, cfg)
    p1 = jax.tree.leaves(ts1["models"])
    p8 = jax.tree.leaves(ts8["models"])
    diffs = np.concatenate([
        np.abs(np.asarray(a) - np.asarray(b)).ravel() for a, b in zip(p1, p8)
    ])
    assert float(diffs.mean()) < 2e-5, f"mean {diffs.mean()}"
    assert float(np.quantile(diffs, 0.99)) < 2e-4, f"p99 {np.quantile(diffs, 0.99)}"
    assert float(diffs.max()) < 2e-3, f"max {diffs.max()}"


def test_local_dp_runs_and_keeps_params_replicated(mesh):
    cfg = TrainConfig(image_size=IMAGE_SIZE, precision="f32", bn_sync=False)
    ts = init_train_state(jax.random.PRNGKey(1), cfg)
    ts = replicate_train_state(ts, mesh, cfg)
    gen_step, dis_step = make_dp_train_steps(cfg, mesh)

    for it, (A, B) in enumerate(_data(3, seed=2)):
        step = dis_step if cfg.is_dis_iter(it) else gen_step
        ts, losses = step(ts, jnp.asarray(A), jnp.asarray(B),
                          jnp.float32(cfg.rate_for(it)))
        assert np.isfinite(float(losses["gen_total"]))
        assert np.isfinite(float(losses["dis_total"]))

    # BN states carry a leading replica axis and have genuinely diverged
    # per replica (per-replica stats), while params stayed replicated.
    st = ts["model_states"]["gen_B"]["latent"]["mean"]
    assert np.asarray(st).shape[0] == N_DEV
    assert not np.allclose(np.asarray(st)[0], np.asarray(st)[1])


def test_local_dp_composes_with_remat(mesh):
    """shard_map DP + jax.checkpoint remat (the 512px DP configuration)."""
    cfg = TrainConfig(image_size=IMAGE_SIZE, precision="f32", remat=True)
    ts = init_train_state(jax.random.PRNGKey(5), cfg)
    ts = replicate_train_state(ts, mesh, cfg)
    gen_step, dis_step = make_dp_train_steps(cfg, mesh)
    for it, (A, B) in enumerate(_data(2, seed=5)):
        step = dis_step if cfg.is_dis_iter(it) else gen_step
        ts, losses = step(ts, jnp.asarray(A), jnp.asarray(B),
                          jnp.float32(cfg.rate_for(it)))
        assert np.isfinite(float(losses["gen_total"]))
