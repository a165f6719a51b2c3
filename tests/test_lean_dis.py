"""Lean D-step (--lean_dis): skipping ABA/BAB on non-logged D iterations
must leave the WEIGHT trajectory bit-identical (training-mode BN uses
batch statistics, and dis_loss never reads the reconstructions); only the
generators' BN running-statistic bookkeeping may differ."""

import numpy as np

import jax
import jax.numpy as jnp

from discogan_modernized_tpu.train import TrainConfig, init_train_state, make_train_steps
from discogan_modernized_tpu.train.step import make_lean_dis_step, make_scan_train_step


def _params_only(ts):
    return jax.tree.leaves(ts["models"])


def _run(cfg, lean: bool, n_iters: int, A, B, log_interval: int):
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    gen_step, dis_step = make_train_steps(cfg)
    lean_step = make_lean_dis_step(cfg) if lean else None
    logged = {}
    for j in range(n_iters):
        if cfg.is_dis_iter(j):
            step = (lean_step if lean_step is not None
                    and j % log_interval != 0 else dis_step)
        else:
            step = gen_step
        ts, losses = step(ts, A, B, jnp.float32(cfg.rate_for(j)))
        if j % log_interval == 0:
            logged[j] = {k: float(v) for k, v in losses.items()}
    return ts, logged


def test_lean_dis_weights_and_logged_losses_identical():
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    B = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    cfg = TrainConfig(image_size=32, precision="f32")

    ts_full, log_full = _run(cfg, False, 13, A, B, log_interval=4)
    ts_lean, log_lean = _run(cfg, True, 13, A, B, log_interval=4)

    for a, b in zip(_params_only(ts_full), _params_only(ts_lean)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Logged iterations run the full graph under lean too — every logged
    # loss component (incl. recon) must be exactly equal.
    assert log_full.keys() == log_lean.keys()
    for j in log_full:
        assert log_full[j] == log_lean[j], j
    # Discriminator BN states advance identically (all 4 D forwards run
    # in both modes); generator running stats are the documented delta.
    for a, b in zip(jax.tree.leaves(ts_full["model_states"]["dis_A"]),
                    jax.tree.leaves(ts_lean["model_states"]["dis_A"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    gen_diff = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(ts_full["model_states"]["gen_A"]),
                        jax.tree.leaves(ts_lean["model_states"]["gen_A"])))
    assert gen_diff > 0.0  # ABA/BAB stat updates really were skipped


def test_lean_dis_scan_matches_per_step():
    """The fused-scan lean program (lax.switch routing) must reproduce the
    per-step lean trajectory, including full-graph log iterations."""
    rng = np.random.RandomState(1)
    n_data, batch, k = 8, 4, 6
    data_A = jnp.asarray(rng.rand(n_data, 16, 16, 3), jnp.float32)
    data_B = jnp.asarray(rng.rand(n_data, 16, 16, 3), jnp.float32)
    ia = rng.randint(0, n_data, (k, batch))
    ib = rng.randint(0, n_data, (k, batch))
    cfg = TrainConfig(image_size=16, precision="f32", lean_dis=True,
                      log_interval=2)

    ts1 = init_train_state(jax.random.PRNGKey(2), cfg)
    scan = make_scan_train_step(cfg, steps=k)
    ts1, losses1 = scan(ts1, data_A, data_B,
                        jnp.asarray(ia, jnp.int32), jnp.asarray(ib, jnp.int32),
                        jnp.int32(0))

    ts2 = init_train_state(jax.random.PRNGKey(2), cfg)
    gen_step, dis_step = make_train_steps(cfg)
    lean_step = make_lean_dis_step(cfg)
    per_losses = []
    for j in range(k):
        A = jnp.take(data_A, jnp.asarray(ia[j], jnp.int32), axis=0)
        B = jnp.take(data_B, jnp.asarray(ib[j], jnp.int32), axis=0)
        if cfg.is_dis_iter(j):
            step = dis_step if j % cfg.log_interval == 0 else lean_step
        else:
            step = gen_step
        ts2, losses = step(ts2, A, B, jnp.float32(cfg.rate_for(j)))
        per_losses.append({kk: float(v) for kk, v in losses.items()})

    # Scan vs per-step drifts only by f32 reassociation; same bounds as
    # tests/test_scan_step.py uses for the non-lean path (note Adam's
    # early steps are sign-like — update ~= +-lr even for tiny grads — so
    # the bound cannot be made much tighter without shortening the run).
    for a, b in zip(_params_only(ts1), _params_only(ts2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    for j in (0, 2, 4):  # log iterations: full-graph values in the stack
        for kk in per_losses[j]:
            np.testing.assert_allclose(
                float(losses1[kk][j]), per_losses[j][kk],
                atol=1e-3, rtol=2e-3, err_msg=f"iter {j} {kk}")
    # The non-logged D iteration (j=3: dis iter at update_interval=3,
    # 3 % log_interval != 0) reports recon == 0 from the lean branch.
    assert float(losses1["recon_A"][3]) == 0.0
    assert float(losses1["recon_B"][3]) == 0.0


def test_lean_dis_dp_weights_identical():
    """Under 8-way data parallelism the lean D-step must keep the WEIGHT
    trajectory bit-identical to the full DP D-step (same guarantee the
    single-device test above proves) — this is the path that serves the
    512px v5e-8 DP config (BASELINE config[4])."""
    from discogan_modernized_tpu.core.mesh import make_mesh
    from discogan_modernized_tpu.parallel import (
        make_dp_train_steps, make_dp_lean_dis_step, replicate_train_state)

    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    rng = np.random.RandomState(3)
    A = jnp.asarray(rng.rand(16, 16, 16, 3), jnp.float32)
    B = jnp.asarray(rng.rand(16, 16, 16, 3), jnp.float32)
    cfg = TrainConfig(image_size=16, precision="f32")
    log_interval = 4

    def run(lean):
        ts = replicate_train_state(
            init_train_state(jax.random.PRNGKey(0), cfg), mesh, cfg)
        gen_step, dis_step = make_dp_train_steps(cfg, mesh)
        lean_step = make_dp_lean_dis_step(cfg, mesh) if lean else None
        for j in range(13):
            if cfg.is_dis_iter(j):
                step = (lean_step if lean_step is not None
                        and j % log_interval != 0 else dis_step)
            else:
                step = gen_step
            ts, losses = step(ts, A, B, jnp.float32(cfg.rate_for(j)))
        return ts, losses

    ts_full, losses_full = run(False)
    ts_lean, losses_lean = run(True)
    for a, b in zip(_params_only(ts_full), _params_only(ts_lean)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Final (gen) iteration's losses come from the identical full graph.
    for k in losses_full:
        assert float(losses_full[k]) == float(losses_lean[k]), k
    # Discriminator BN states (replica-stacked, local mode) also identical.
    for a, b in zip(jax.tree.leaves(ts_full["model_states"]["dis_A"]),
                    jax.tree.leaves(ts_lean["model_states"]["dis_A"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lean_dis_cli_e2e(tmp_path):
    """--lean_dis end-to-end: training completes, and every logged line
    carries real (nonzero) recon values because log-cadence iterations
    run the full graph."""
    import re

    from discogan_modernized_tpu.cli.image_translation import main

    # log_interval=4 is coprime with update_interval=3, so D iterations
    # 3, 6, 9, ... really take the LEAN branch (iteration 0 and 12 are
    # logged D iterations and take the full graph) — with log_interval=3
    # every D iteration would be logged and the lean path never executed.
    result_path, model_path = main([
        "--task_name=synthetic", "--model_arch=discogan", "--image_size=16",
        "--batch_size=8", "--epochs=2", "--log_interval=4",
        "--image_save_interval=100", "--model_save_interval=100",
        f"--results_dir={tmp_path}/results", f"--models_dir={tmp_path}/models",
        "--precision=f32", "--lean_dis",
    ])
    assert (model_path / "gen_B_final.pth").exists()
    log = (result_path / "training_log.txt").read_text()
    recs = re.findall(r"RECON: ([0-9.]+)/([0-9.]+)", log)
    assert recs, log
    assert all(float(a) > 0 and float(b) > 0 for a, b in recs), recs
