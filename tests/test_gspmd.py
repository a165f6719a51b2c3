"""GSPMD DPxTP tests on the 8-virtual-device mesh.

Channel sharding (TP) of wide conv kernels composed with data parallelism,
with XLA inserting the collectives. GSPMD computes the one logical program,
so results must equal single-device sync-BN training on the global batch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from discogan_modernized_tpu.core.mesh import make_mesh, MODEL_AXIS
from discogan_modernized_tpu.core.precision import F32
from discogan_modernized_tpu.train import TrainConfig, init_train_state, make_train_steps
from discogan_modernized_tpu.parallel import (
    make_gspmd_train_steps,
    place_train_state,
    train_state_shardings,
)

IMAGE_SIZE = 64  # wide enough channels (512) for TP to engage
GLOBAL_BATCH = 8


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8
    return make_mesh(n_data=2, n_model=4)


def _data(n_steps, seed=0):
    rng = np.random.RandomState(seed)
    return [
        (rng.rand(GLOBAL_BATCH, IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32),
         rng.rand(GLOBAL_BATCH, IMAGE_SIZE, IMAGE_SIZE, 3).astype(np.float32))
        for _ in range(n_steps)
    ]


def test_wide_kernels_are_model_sharded(mesh):
    cfg = TrainConfig(image_size=IMAGE_SIZE, precision="f32")
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    shardings = train_state_shardings(ts, mesh)
    # 256->512 encoder conv: shardable; first conv (3->64): replicated.
    wide = shardings["models"]["gen_A"]["encoder"][3]["w"]
    narrow = shardings["models"]["gen_A"]["encoder"][0]["w"]
    assert wide.spec == jax.sharding.PartitionSpec(None, None, None, MODEL_AXIS)
    assert narrow.spec == jax.sharding.PartitionSpec()

    ts = place_train_state(ts, mesh)
    w = ts["models"]["gen_A"]["encoder"][3]["w"]
    assert w.sharding.spec[-1] == MODEL_AXIS


def test_gspmd_dp_tp_matches_single_device(mesh):
    cfg = TrainConfig(image_size=IMAGE_SIZE, precision="f32",
                      gan_curriculum=2, starting_rate=0.01, default_rate=0.5)
    data = _data(4)

    ts1 = init_train_state(jax.random.PRNGKey(0), cfg)
    gen1, dis1 = make_train_steps(cfg, F32)
    log1 = []
    for it, (A, B) in enumerate(data):
        step = dis1 if cfg.is_dis_iter(it) else gen1
        ts1, losses = step(ts1, jnp.asarray(A), jnp.asarray(B),
                           jnp.float32(cfg.rate_for(it)))
        log1.append({k: float(v) for k, v in losses.items()})

    tsg = init_train_state(jax.random.PRNGKey(0), cfg)
    tsg = place_train_state(tsg, mesh)
    geng, disg = make_gspmd_train_steps(cfg, mesh, F32)
    logg = []
    for it, (A, B) in enumerate(data):
        step = disg if cfg.is_dis_iter(it) else geng
        tsg, losses = step(tsg, jnp.asarray(A), jnp.asarray(B),
                           jnp.float32(cfg.rate_for(it)))
        logg.append({k: float(v) for k, v in losses.items()})

    # Same statistical gate as the other trajectory tests: sharded
    # reduction order + Adam's ±lr*sign(g) first-step updates amplify fp
    # noise on near-zero-grad elements.
    for i, (l1, lg) in enumerate(zip(log1, logg)):
        for k in l1:
            assert abs(l1[k] - lg[k]) < 5e-3, f"step {i} {k}: {l1[k]} vs {lg[k]}"

    p1 = jax.tree.leaves(ts1["models"])
    pg = jax.tree.leaves(jax.device_get(tsg["models"]))
    diffs = np.concatenate([
        np.abs(np.asarray(a) - np.asarray(b)).ravel() for a, b in zip(p1, pg)
    ])
    assert float(diffs.mean()) < 2e-5
    assert float(diffs.max()) < 2e-3


def test_spatial_partitioning_matches_single_device(mesh):
    """Height-sharded ("sequence parallel" analog) training step equals
    single-device; XLA inserts conv halo exchanges at shard boundaries."""
    cfg = TrainConfig(image_size=32, precision="f32")
    rng = np.random.RandomState(3)
    A = rng.rand(4, 32, 32, 3).astype(np.float32)
    B = rng.rand(4, 32, 32, 3).astype(np.float32)

    ts1 = init_train_state(jax.random.PRNGKey(0), cfg)
    gen1, dis1 = make_train_steps(cfg, F32)
    ts1, l1 = dis1(ts1, jnp.asarray(A), jnp.asarray(B), jnp.float32(0.01))
    ts1, l1 = gen1(ts1, jnp.asarray(A), jnp.asarray(B), jnp.float32(0.01))

    tss = init_train_state(jax.random.PRNGKey(0), cfg)
    gens, diss = make_gspmd_train_steps(cfg, mesh, F32, spatial=True)
    tss, ls = diss(tss, jnp.asarray(A), jnp.asarray(B), jnp.float32(0.01))
    tss, ls = gens(tss, jnp.asarray(A), jnp.asarray(B), jnp.float32(0.01))

    for k in l1:
        assert abs(float(l1[k]) - float(ls[k])) < 1e-4, k
    diffs = np.concatenate([
        np.abs(np.asarray(a) - np.asarray(jax.device_get(b))).ravel()
        for a, b in zip(jax.tree.leaves(ts1["models"]),
                        jax.tree.leaves(tss["models"]))
    ])
    assert float(diffs.max()) < 5e-4
