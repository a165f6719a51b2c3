"""The round-3 DP fast input path: sharded HBM-resident dataset + fused
multi-step scan under data parallelism (parallel/dp.py
make_dp_scan_train_step + the train/loop.py routing).

Equivalence target: driving make_dp_train_steps per step on global
batches assembled from the same per-shard indices. Same-state single
calls must agree tightly; multi-step trajectories only statistically
(Adam's ±lr*sign(g) first-step flips amplify f32 reduction-order noise —
the same gates test_gspmd/test_scan_step use).
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from discogan_modernized_tpu.core.mesh import make_mesh, DATA_AXIS
from discogan_modernized_tpu.train import TrainConfig, init_train_state
from discogan_modernized_tpu.parallel import (
    make_dp_train_steps,
    make_dp_lean_dis_step,
    make_dp_scan_train_step,
    replicate_train_state,
)

N_DEV, SIZE, PDB = 8, 16, 2
GB = N_DEV * PDB  # global batch
L = 10            # per-device dataset shard length


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= N_DEV
    return make_mesh(N_DEV)


def _sharded_data(mesh, seed=0):
    rng = np.random.RandomState(seed)
    data_A = rng.rand(N_DEV * L, SIZE, SIZE, 3).astype(np.float32)
    data_B = rng.rand(N_DEV * L, SIZE, SIZE, 3).astype(np.float32)
    ds = NamedSharding(mesh, P(DATA_AXIS))
    return data_A, data_B, jax.device_put(data_A, ds), jax.device_put(data_B, ds)


def _global_batch(data, idx_row):
    """Assemble the global batch the per-step DP path sees for one step:
    device d's rows are its shard gathered with its local index block."""
    return np.concatenate([data[d * L + idx_row[d * PDB:(d + 1) * PDB]]
                           for d in range(N_DEV)])


@pytest.mark.parametrize("bn_sync", [False, True])
def test_dp_scan_single_call_matches_per_step(mesh, bn_sync):
    """A 1-step scan call from a given state equals the per-step DP
    program bit-tightly, for each branch type (full D, G, lean D)."""
    cfg = TrainConfig(image_size=SIZE, precision="f32", lean_dis=True,
                      log_interval=50, bn_sync=bn_sync)
    data_A, data_B, dev_A, dev_B = _sharded_data(mesh)
    isrd = NamedSharding(mesh, P(None, DATA_AXIS))
    bsrd = NamedSharding(mesh, P(DATA_AXIS))

    multi1 = make_dp_scan_train_step(cfg, mesh, steps=1)
    gen_step, dis_step = make_dp_train_steps(cfg, mesh)
    lean_step = make_dp_lean_dis_step(cfg, mesh)

    rng = np.random.RandomState(1)
    ts0 = replicate_train_state(
        init_train_state(jax.random.PRNGKey(0), cfg), mesh, cfg)
    host0 = jax.device_get(ts0)

    # it=0: logged D iteration (full graph); it=1: G; it=3: lean D.
    for it, ref_step in ((0, dis_step), (1, gen_step), (3, lean_step)):
        ia = rng.randint(0, L, (1, GB)).astype(np.int32)
        ib = rng.randint(0, L, (1, GB)).astype(np.int32)

        ts_s, ls = multi1(jax.tree.map(jnp.asarray, host0), dev_A, dev_B,
                          jax.device_put(ia, isrd), jax.device_put(ib, isrd),
                          jnp.int32(it))
        A = jax.device_put(_global_batch(data_A, ia[0]), bsrd)
        B = jax.device_put(_global_batch(data_B, ib[0]), bsrd)
        ts_r, lr = ref_step(jax.tree.map(jnp.asarray, host0), A, B,
                            jnp.float32(cfg.rate_for(it)))

        for k in lr:
            assert abs(float(ls[k][0]) - float(lr[k])) < 1e-5, (it, k)
        # Same gates as test_gspmd's same-state comparison: identical up
        # to Adam's ±lr*sign(g) quantum on near-zero-grad elements (the
        # two programs fuse differently, so 1e-8 reduction-order noise can
        # flip a sign), tiny in the mean.
        diffs = np.concatenate([
            np.abs(np.asarray(a) - np.asarray(b)).ravel()
            for a, b in zip(jax.tree.leaves(jax.device_get(ts_s["models"])),
                            jax.tree.leaves(jax.device_get(ts_r["models"])))])
        assert float(diffs.mean()) < 2e-5, (it,)
        assert float(diffs.max()) <= 2.1 * cfg.learning_rate, (it,)
        # Raw-gradient agreement (Adam m = (1-beta1)*g at t=1): reduction-
        # order rounding only — guards against real gather/sharding bugs,
        # which would show up at 1e-1 scale.
        mdiffs = np.concatenate([
            np.abs(np.asarray(a) - np.asarray(b)).ravel()
            for a, b in zip(
                jax.tree.leaves(jax.device_get(ts_s["opt_gen"]["m"]))
                + jax.tree.leaves(jax.device_get(ts_s["opt_dis"]["m"])),
                jax.tree.leaves(jax.device_get(ts_r["opt_gen"]["m"]))
                + jax.tree.leaves(jax.device_get(ts_r["opt_dis"]["m"])))])
        assert float(mdiffs.max()) < 2e-3, (it,)


def test_dp_scan_trajectory_matches_per_step(mesh):
    """6 fused steps vs 6 per-step DP steps on the same index sequence:
    per-iteration losses and final params agree within the documented
    f32-reassociation drift gates."""
    cfg = TrainConfig(image_size=SIZE, precision="f32", lean_dis=True,
                      log_interval=5)
    data_A, data_B, dev_A, dev_B = _sharded_data(mesh, seed=2)
    isrd = NamedSharding(mesh, P(None, DATA_AXIS))
    bsrd = NamedSharding(mesh, P(DATA_AXIS))
    steps = 6
    rng = np.random.RandomState(3)
    idx = rng.randint(0, L, (2, steps, GB)).astype(np.int32)

    multi = make_dp_scan_train_step(cfg, mesh, steps=steps)
    ts_s = replicate_train_state(
        init_train_state(jax.random.PRNGKey(0), cfg), mesh, cfg)
    ts_s, losses = multi(ts_s, dev_A, dev_B,
                         jax.device_put(idx[0], isrd),
                         jax.device_put(idx[1], isrd), jnp.int32(0))
    assert losses["gen_total"].shape == (steps,)

    gen_step, dis_step = make_dp_train_steps(cfg, mesh)
    lean_step = make_dp_lean_dis_step(cfg, mesh)
    ts_r = replicate_train_state(
        init_train_state(jax.random.PRNGKey(0), cfg), mesh, cfg)
    for j in range(steps):
        A = jax.device_put(_global_batch(data_A, idx[0, j]), bsrd)
        B = jax.device_put(_global_batch(data_B, idx[1, j]), bsrd)
        if cfg.use_lean_dis(j):
            step = lean_step
        elif cfg.is_dis_iter(j):
            step = dis_step
        else:
            step = gen_step
        ts_r, lr = step(ts_r, A, B, jnp.float32(cfg.rate_for(j)))
        for k in lr:
            assert float(losses[k][j]) == pytest.approx(
                float(lr[k]), rel=2e-2, abs=6e-3), (j, k)

    for a, b in zip(jax.tree.leaves(jax.device_get(ts_s["models"])),
                    jax.tree.leaves(jax.device_get(ts_r["models"]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_sharded_epoch_indices_cover_each_shard_once():
    """Per-shard permutations: within an epoch no index repeats inside a
    device's column block, and all indices stay in [0, shard_len)."""
    from discogan_modernized_tpu.data.pipeline import PrefetchLoader, synthetic_pair

    a, b = synthetic_pair(40, 8)
    loader = PrefetchLoader(a, b, batch_size=8, image_size=8,
                            device_put=False, device_cache=False)
    mesh = make_mesh(4)
    n_local = 4
    pdb = 8 // n_local
    n_batches = 40 // 8
    ia, ib = loader.sharded_epoch_indices(mesh, 8, n_batches, 10, 10)
    assert ia.shape == (n_batches, 8) and ia.dtype == np.int32
    for block in range(n_local):
        col = ia[:, block * pdb:(block + 1) * pdb].ravel()
        assert col.min() >= 0 and col.max() < 10
        assert len(set(col.tolist())) == len(col)  # no repeats in-epoch


def test_distributed_cli_routes_dp_scan(tmp_path, monkeypatch):
    """The distributed trainer (synthetic task, dp mode) routes through
    the DP scan program by default and keeps the training_log contract."""
    import discogan_modernized_tpu.parallel as par

    calls = {"n": 0}
    real = par.make_dp_scan_train_step

    def spy(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(par, "make_dp_scan_train_step", spy)

    from discogan_modernized_tpu.cli.distributed_image_translation import main

    result_path, model_path = main([
        "--task_name=synthetic", "--model_arch=discogan", "--image_size=16",
        "--batch_size=8", "--epochs=2", "--distributed", "--world_size=8",
        "--parallel_mode=dp", "--log_interval=8", "--lean_dis",
        "--image_save_interval=1000000", "--model_save_interval=1000000",
        f"--results_dir={tmp_path}/r", f"--models_dir={tmp_path}/m",
        "--precision=f32",
    ])
    assert calls["n"] >= 1, "DP run did not build the scan program"
    log = (result_path / "training_log.txt").read_text()
    lines = re.findall(r"Iter \[\d+/64\] GEN: \d+\.\d{4}/\d+\.\d{4}, "
                       r"FM: \d+\.\d{4}/\d+\.\d{4}, "
                       r"RECON: \d+\.\d{4}/\d+\.\d{4}, "
                       r"DIS: \d+\.\d{4}/\d+\.\d{4}", log)
    assert len(lines) >= 8
    for name in ("gen_A", "gen_B", "dis_A", "dis_B"):
        assert (model_path / f"{name}_final.pth").exists()


def test_distributed_cli_dp_scan_respects_no_device_cache(tmp_path,
                                                          monkeypatch):
    """--no_device_cache must keep the DP trainer on the host-fed
    per-step path (no scan program builds)."""
    import discogan_modernized_tpu.parallel as par

    calls = {"n": 0}
    real = par.make_dp_scan_train_step

    def spy(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(par, "make_dp_scan_train_step", spy)

    from discogan_modernized_tpu.cli.distributed_image_translation import main

    result_path, _ = main([
        "--task_name=synthetic", "--model_arch=gan", "--image_size=16",
        "--batch_size=8", "--epochs=1", "--distributed", "--world_size=8",
        "--parallel_mode=dp", "--log_interval=8", "--no_device_cache",
        "--image_save_interval=1000000", "--model_save_interval=1000000",
        f"--results_dir={tmp_path}/r", f"--models_dir={tmp_path}/m",
        "--precision=f32",
    ])
    assert calls["n"] == 0
    assert (result_path / "training_log.txt").exists()


def test_dp_phase_scan_trajectory_matches_per_step(mesh):
    """Round-3 phase variants under DP (straight-line [D,G,G] periods in
    shard_map): same per-iteration losses and final params as per-step DP
    routing. Window 1 contains a logged-D (variant phase_cond); window 2
    does not (pure phase)."""
    from discogan_modernized_tpu.train.step import scan_variant

    cfg = TrainConfig(image_size=SIZE, precision="f32", lean_dis=True,
                      log_interval=5)
    data_A, data_B, dev_A, dev_B = _sharded_data(mesh, seed=4)
    isrd = NamedSharding(mesh, P(None, DATA_AXIS))
    bsrd = NamedSharding(mesh, P(DATA_AXIS))
    gen_step, dis_step = make_dp_train_steps(cfg, mesh)
    lean_step = make_dp_lean_dis_step(cfg, mesh)
    rng = np.random.RandomState(5)

    for start, steps, expect in ((0, 6, "phase_cond"), (6, 3, "phase")):
        assert scan_variant(cfg, start, steps) == expect
        idx = rng.randint(0, L, (2, steps, GB)).astype(np.int32)

        multi = make_dp_scan_train_step(cfg, mesh, steps=steps,
                                        variant=expect)
        ts_s = replicate_train_state(
            init_train_state(jax.random.PRNGKey(0), cfg), mesh, cfg)
        ts_s, losses = multi(ts_s, dev_A, dev_B,
                             jax.device_put(idx[0], isrd),
                             jax.device_put(idx[1], isrd), jnp.int32(start))

        ts_r = replicate_train_state(
            init_train_state(jax.random.PRNGKey(0), cfg), mesh, cfg)
        for j in range(start, start + steps):
            A = jax.device_put(_global_batch(data_A, idx[0, j - start]), bsrd)
            B = jax.device_put(_global_batch(data_B, idx[1, j - start]), bsrd)
            if cfg.use_lean_dis(j):
                step = lean_step
            elif cfg.is_dis_iter(j):
                step = dis_step
            else:
                step = gen_step
            ts_r, lr = step(ts_r, A, B, jnp.float32(cfg.rate_for(j)))
            for k in lr:
                assert float(losses[k][j - start]) == pytest.approx(
                    float(lr[k]), rel=2e-2, abs=6e-3), (start, j, k)

        for a, b in zip(jax.tree.leaves(jax.device_get(ts_s["models"])),
                        jax.tree.leaves(jax.device_get(ts_r["models"]))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-3)
