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
    single-device; XLA inserts conv halo exchanges at shard boundaries.

    Each branch (D update, then G update) is compared FROM THE SAME state:
    multi-step trajectory comparison is chaotic (Adam's first-step
    +-lr*sign(g) flips on near-zero-grad elements turn ~1e-7 reduction-
    order rounding into visible loss divergence by step 2), while
    same-state steps must agree tightly — and do, to ~1e-6."""
    cfg = TrainConfig(image_size=32, precision="f32")
    rng = np.random.RandomState(3)
    A = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    B = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))

    gen1, dis1 = make_train_steps(cfg, F32)
    gens, diss = make_gspmd_train_steps(cfg, mesh, F32, spatial=True)

    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    for step1, steps in ((dis1, diss), (gen1, gens)):
        host = jax.device_get(ts)
        ts, l1 = step1(jax.tree.map(jnp.asarray, host), A, B, jnp.float32(0.01))
        tss, ls = steps(jax.tree.map(jnp.asarray, host), A, B, jnp.float32(0.01))
        for k in l1:
            assert abs(float(l1[k]) - float(ls[k])) < 1e-5, k
        diffs = np.concatenate([
            np.abs(np.asarray(a) - np.asarray(jax.device_get(b))).ravel()
            for a, b in zip(jax.tree.leaves(ts["models"]),
                            jax.tree.leaves(tss["models"]))
        ])
        # Updated params: identical up to the Adam sign-flip quantum on
        # the few near-zero-grad elements (<=2*lr), tiny in the mean.
        assert float(diffs.mean()) < 2e-6
        assert float(diffs.max()) <= 2.1 * cfg.learning_rate
        # Raw-gradient agreement (Adam m = 0.5*g at t=1): reduction-order
        # rounding only — guards against the constraint-VJP gradient
        # corruption this test originally caught (0.2-level diffs).
        mdiffs = np.concatenate([
            np.abs(np.asarray(a) - np.asarray(jax.device_get(b))).ravel()
            for a, b in zip(jax.tree.leaves(ts["opt_gen"]["m"])
                            + jax.tree.leaves(ts["opt_dis"]["m"]),
                            jax.tree.leaves(tss["opt_gen"]["m"])
                            + jax.tree.leaves(tss["opt_dis"]["m"]))
        ])
        assert float(mdiffs.max()) < 2e-3


@pytest.mark.parametrize("spatial", [False, True])
def test_gspmd_lean_dis_step_matches_full(mesh, spatial):
    """--lean_dis under gspmd/spatial (round-3): the lean D-step's weight
    update from a given state must be bit-identical to the full D-step's
    (dis_loss never reads the ABA/BAB forwards; training-mode BN uses
    batch stats) — only recon losses (reported 0) and generator BN
    running-stat bookkeeping differ."""
    from discogan_modernized_tpu.parallel import (
        make_gspmd_lean_dis_step, make_gspmd_train_steps, place_train_state)

    size = 32 if spatial else IMAGE_SIZE
    cfg = TrainConfig(image_size=size, precision="f32", lean_dis=True)
    rng = np.random.RandomState(7)
    A = jnp.asarray(rng.rand(8, size, size, 3).astype(np.float32))
    B = jnp.asarray(rng.rand(8, size, size, 3).astype(np.float32))

    _, dis_full = make_gspmd_train_steps(cfg, mesh, F32, spatial=spatial)
    dis_lean = make_gspmd_lean_dis_step(cfg, mesh, F32, spatial=spatial)

    ts0 = init_train_state(jax.random.PRNGKey(0), cfg)
    if not spatial:
        ts0 = place_train_state(ts0, mesh)
    host = jax.device_get(ts0)

    ts_f, l_f = dis_full(jax.tree.map(jnp.asarray, host), A, B,
                         jnp.float32(0.01))
    ts_l, l_l = dis_lean(jax.tree.map(jnp.asarray, host), A, B,
                         jnp.float32(0.01))

    assert float(l_l["recon_A"]) == 0.0  # lean reports no recon losses
    assert abs(float(l_f["dis_total"]) - float(l_l["dis_total"])) < 1e-6
    for a, b in zip(jax.tree.leaves(ts_f["models"]),
                    jax.tree.leaves(ts_l["models"])):
        np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                      np.asarray(jax.device_get(b)))
