"""Round-4 GSPMD fast input path (VERDICT r3 item 5): the fused
multi-step scan + data-axis-sharded HBM dataset under DPxTP / spatial
sharding (parallel/gspmd.py make_gspmd_scan_train_step + the
train/loop.py routing).

The batch gather runs manual over the data axis (jax.shard_map
axis_names={data}) while the step body stays auto (GSPMD) — so the
equivalence target is driving make_gspmd_train_steps per step on global
batches assembled from the same per-shard local indices. Same gates as
test_dp_scan / test_gspmd.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from discogan_modernized_tpu.core.mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from discogan_modernized_tpu.train import TrainConfig, init_train_state
from discogan_modernized_tpu.parallel import (
    make_gspmd_train_steps,
    make_gspmd_lean_dis_step,
    place_train_state,
)
from discogan_modernized_tpu.parallel.gspmd import make_gspmd_scan_train_step

N_DATA, TP, SIZE, PDB = 4, 2, 32, 2
GB = N_DATA * PDB  # global batch
L = 6              # per-data-shard dataset length


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= N_DATA * TP
    return make_mesh(n_data=N_DATA, n_model=TP)


def _sharded_data(mesh, seed=0):
    rng = np.random.RandomState(seed)
    data_A = rng.rand(N_DATA * L, SIZE, SIZE, 3).astype(np.float32)
    data_B = rng.rand(N_DATA * L, SIZE, SIZE, 3).astype(np.float32)
    ds = NamedSharding(mesh, P(DATA_AXIS))
    return data_A, data_B, jax.device_put(data_A, ds), jax.device_put(data_B, ds)


def _global_batch(data, idx_row):
    """The global batch the scan's manual gather produces for one step:
    data-shard d's rows are its block gathered with its local index
    columns, concatenated in data-axis order."""
    return np.concatenate([data[d * L + idx_row[d * PDB:(d + 1) * PDB]]
                           for d in range(N_DATA)])


@pytest.mark.parametrize("spatial", [False])
def test_gspmd_scan_trajectory_matches_per_step(mesh, spatial):
    """6 fused steps vs 6 per-step GSPMD steps on the same per-shard
    index sequence: per-iteration losses and final params agree within
    the documented f32-reassociation drift gates, in TP mode
    (channel-sharded kernels compose with the manual data-axis gather).

    SPATIAL is measured-and-declined for the scan route (PERF.md round
    4): the spatial partitioner diverges the latent/enc0 first Adam
    moments 0.013-0.033 under the scan body vs per-step (envelope <2e-3;
    variant-independent) — the fragile-pin gradient class test_gspmd's
    m-gate guards. test_gspmd_spatial_scan_not_routed pins the decline.
    """
    cfg = TrainConfig(image_size=SIZE, precision="f32", lean_dis=True,
                      log_interval=5)
    data_A, data_B, dev_A, dev_B = _sharded_data(mesh, seed=2)
    isrd = NamedSharding(mesh, P(None, DATA_AXIS))
    bsrd = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS) if spatial
                         else P(DATA_AXIS))
    steps = 6
    rng = np.random.RandomState(3)
    idx = rng.randint(0, L, (2, steps, GB)).astype(np.int32)

    multi = make_gspmd_scan_train_step(cfg, mesh, steps=steps,
                                       spatial=spatial)
    ts0 = init_train_state(jax.random.PRNGKey(0), cfg)
    if spatial:
        ts_s = jax.device_put(ts0, jax.tree.map(
            lambda _: NamedSharding(mesh, P()), ts0))
    else:
        ts_s = place_train_state(ts0, mesh)
    ts_s, losses = multi(ts_s, dev_A, dev_B,
                         jax.device_put(idx[0], isrd),
                         jax.device_put(idx[1], isrd), jnp.int32(0))
    assert losses["gen_total"].shape == (steps,)

    gen_step, dis_step = make_gspmd_train_steps(cfg, mesh, spatial=spatial)
    lean_step = make_gspmd_lean_dis_step(cfg, mesh, spatial=spatial)
    ts1 = init_train_state(jax.random.PRNGKey(0), cfg)
    if spatial:
        ts_r = jax.device_put(ts1, jax.tree.map(
            lambda _: NamedSharding(mesh, P()), ts1))
    else:
        ts_r = place_train_state(ts1, mesh)
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
                float(lr[k]), rel=2e-2, abs=6e-3), (spatial, j, k)

    for a, b in zip(jax.tree.leaves(jax.device_get(ts_s["models"])),
                    jax.tree.leaves(jax.device_get(ts_r["models"]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_gspmd_phase_scan_matches_switch(mesh):
    """The phase-aligned variants run under GSPMD too: the phase_cond
    program from iteration 0 equals the switch program on the same
    indices (same trajectory, different body structure)."""
    from discogan_modernized_tpu.train.step import scan_variant

    cfg = TrainConfig(image_size=SIZE, precision="f32", lean_dis=True,
                      log_interval=5)
    data_A, data_B, dev_A, dev_B = _sharded_data(mesh, seed=4)
    isrd = NamedSharding(mesh, P(None, DATA_AXIS))
    steps = 6
    assert scan_variant(cfg, 0, steps) == "phase_cond"
    rng = np.random.RandomState(5)
    idx = rng.randint(0, L, (2, steps, GB)).astype(np.int32)

    outs = {}
    for variant in ("switch", "phase_cond"):
        multi = make_gspmd_scan_train_step(cfg, mesh, steps=steps,
                                           variant=variant)
        ts = place_train_state(init_train_state(jax.random.PRNGKey(0), cfg),
                               mesh)
        ts, losses = multi(ts, dev_A, dev_B,
                           jax.device_put(idx[0], isrd),
                           jax.device_put(idx[1], isrd), jnp.int32(0))
        outs[variant] = (jax.device_get(ts["models"]),
                         jax.device_get(losses))

    for k in outs["switch"][1]:
        np.testing.assert_allclose(outs["switch"][1][k],
                                   outs["phase_cond"][1][k],
                                   rtol=2e-2, atol=6e-3)
    for a, b in zip(jax.tree.leaves(outs["switch"][0]),
                    jax.tree.leaves(outs["phase_cond"][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_distributed_cli_routes_gspmd_scan(tmp_path, monkeypatch):
    """The distributed trainer in gspmd mode routes the fast input path
    (sharded HBM dataset + fused scan) by default and keeps the
    training_log contract."""
    import discogan_modernized_tpu.parallel.gspmd as gspmd_mod

    calls = {"n": 0}
    real = gspmd_mod.make_gspmd_scan_train_step

    def spy(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(gspmd_mod, "make_gspmd_scan_train_step", spy)

    from discogan_modernized_tpu.cli.distributed_image_translation import main

    result_path, model_path = main([
        "--task_name=synthetic", "--model_arch=discogan", "--image_size=16",
        "--batch_size=8", "--epochs=2", "--distributed", "--world_size=8",
        "--parallel_mode=gspmd", "--tp=2", "--log_interval=8", "--lean_dis",
        "--image_save_interval=1000000", "--model_save_interval=1000000",
        f"--results_dir={tmp_path}/r", f"--models_dir={tmp_path}/m",
        "--precision=f32",
    ])
    assert calls["n"] >= 1, "gspmd run did not build the scan program"
    log = (result_path / "training_log.txt").read_text()
    lines = re.findall(r"Iter \[\d+/64\] GEN: \d+\.\d{4}/\d+\.\d{4}, "
                       r"FM: \d+\.\d{4}/\d+\.\d{4}, "
                       r"RECON: \d+\.\d{4}/\d+\.\d{4}, "
                       r"DIS: \d+\.\d{4}/\d+\.\d{4}", log)
    assert len(lines) >= 8
    for name in ("gen_A", "gen_B", "dis_A", "dis_B"):
        assert (model_path / f"{name}_final.pth").exists()


def test_gspmd_spatial_scan_not_routed(tmp_path, monkeypatch):
    """Spatial mode stays on the per-step path (measured-and-declined:
    scan-body latent-gradient divergence, see
    test_gspmd_scan_trajectory_matches_per_step's docstring)."""
    import discogan_modernized_tpu.parallel.gspmd as gspmd_mod

    calls = {"n": 0}
    real = gspmd_mod.make_gspmd_scan_train_step

    def spy(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(gspmd_mod, "make_gspmd_scan_train_step", spy)

    from discogan_modernized_tpu.cli.distributed_image_translation import main

    result_path, _ = main([
        "--task_name=synthetic", "--model_arch=gan", "--image_size=16",
        "--batch_size=8", "--epochs=1", "--distributed", "--world_size=8",
        "--parallel_mode=spatial", "--tp=2", "--log_interval=8",
        "--image_save_interval=1000000", "--model_save_interval=1000000",
        f"--results_dir={tmp_path}/r", f"--models_dir={tmp_path}/m",
        "--precision=f32",
    ])
    assert calls["n"] == 0
    assert (result_path / "training_log.txt").exists()


def test_distributed_cli_gspmd_scan_respects_no_device_cache(tmp_path,
                                                             monkeypatch):
    """--no_device_cache keeps gspmd on the host-fed per-step path."""
    import discogan_modernized_tpu.parallel.gspmd as gspmd_mod

    calls = {"n": 0}
    real = gspmd_mod.make_gspmd_scan_train_step

    def spy(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(gspmd_mod, "make_gspmd_scan_train_step", spy)

    from discogan_modernized_tpu.cli.distributed_image_translation import main

    result_path, _ = main([
        "--task_name=synthetic", "--model_arch=gan", "--image_size=16",
        "--batch_size=8", "--epochs=1", "--distributed", "--world_size=8",
        "--parallel_mode=gspmd", "--tp=2", "--log_interval=8",
        "--no_device_cache",
        "--image_save_interval=1000000", "--model_save_interval=1000000",
        f"--results_dir={tmp_path}/r", f"--models_dir={tmp_path}/m",
        "--precision=f32",
    ])
    assert calls["n"] == 0
    assert (result_path / "training_log.txt").exists()
