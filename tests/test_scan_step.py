"""Fused multi-step train program (make_scan_train_step): per-step
equivalence to the two cached jitted programs, G/D alternation and
curriculum handled inside the scan."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    import jax
    import jax.numpy as jnp

    from discogan_modernized_tpu.train.step import (
        TrainConfig, init_train_state, make_train_steps)

    cfg = TrainConfig(image_size=16, model_arch="discogan", precision="f32",
                      gan_curriculum=4, update_interval=3)
    rng = np.random.RandomState(0)
    data_A = jnp.asarray(rng.rand(24, 16, 16, 3), jnp.float32)
    data_B = jnp.asarray(rng.rand(24, 16, 16, 3), jnp.float32)
    idx_A = rng.randint(0, 24, size=(6, 4)).astype(np.int32)
    idx_B = rng.randint(0, 24, size=(6, 4)).astype(np.int32)
    return cfg, data_A, data_B, idx_A, idx_B


def test_scan_matches_per_step_trajectory(setup):
    import jax
    import jax.numpy as jnp

    from discogan_modernized_tpu.train.step import (
        init_train_state, make_train_steps, make_scan_train_step)

    cfg, data_A, data_B, idx_A, idx_B = setup
    K = idx_A.shape[0]

    ts1 = init_train_state(jax.random.PRNGKey(0), cfg)
    ts2 = jax.tree.map(lambda x: x.copy(), ts1)

    gen_step, dis_step = make_train_steps(cfg)
    ref_losses = []
    for j in range(K):
        A = data_A[idx_A[j]]
        B = data_B[idx_B[j]]
        step = dis_step if cfg.is_dis_iter(j) else gen_step
        ts1, l = step(ts1, A, B, jnp.float32(cfg.rate_for(j)))
        ref_losses.append({k: float(v) for k, v in l.items()})

    multi = make_scan_train_step(cfg, steps=K)
    ts2, L = multi(ts2, data_A, data_B, jnp.asarray(idx_A),
                   jnp.asarray(idx_B), jnp.int32(0))

    # Covers both branch types (iters 0,3 are D; others G), the curriculum
    # boundary at 4, and the gather. Tolerance allows compounding f32
    # reassociation between the fused and per-step compilations.
    for j in range(K):
        for k in ref_losses[j]:
            assert float(L[k][j]) == pytest.approx(ref_losses[j][k],
                                                   rel=2e-3, abs=2e-4), (j, k)
    for a, b in zip(jax.tree.leaves(ts1["models"]),
                    jax.tree.leaves(ts2["models"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_scan_resumes_mid_schedule(setup):
    """iters0 offsets alternation and curriculum identically to host-side
    scheduling (resume / call-boundary correctness)."""
    import jax
    import jax.numpy as jnp

    from discogan_modernized_tpu.train.step import (
        init_train_state, make_train_steps, make_scan_train_step)

    cfg, data_A, data_B, idx_A, idx_B = setup
    start = 5  # mid-schedule: not a D iter, past the curriculum boundary
    K = 3

    ts1 = init_train_state(jax.random.PRNGKey(1), cfg)
    ts2 = jax.tree.map(lambda x: x.copy(), ts1)
    gen_step, dis_step = make_train_steps(cfg)
    for j in range(start, start + K):
        A = data_A[idx_A[j - start]]
        B = data_B[idx_B[j - start]]
        step = dis_step if cfg.is_dis_iter(j) else gen_step
        ts1, _ = step(ts1, A, B, jnp.float32(cfg.rate_for(j)))

    multi = make_scan_train_step(cfg, steps=K)
    ts2, _ = multi(ts2, data_A, data_B, jnp.asarray(idx_A[:K]),
                   jnp.asarray(idx_B[:K]), jnp.int32(start))
    for a, b in zip(jax.tree.leaves(ts1["models"]),
                    jax.tree.leaves(ts2["models"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_scan_compile_failure_falls_back_to_per_step(tmp_path, monkeypatch):
    """If the fused-scan program fails to compile (observed on the dev
    backend at 512px b32 — PERF.md), the trainer must fall back to the
    per-step path and complete normally instead of crashing."""
    import discogan_modernized_tpu.train.step as step_mod

    def broken_scan(cfg, steps):
        def fail(*a, **k):
            raise RuntimeError("simulated compile failure")
        return fail

    monkeypatch.setattr(step_mod, "make_scan_train_step", broken_scan)

    from discogan_modernized_tpu.cli.image_translation import main

    result_path, model_path = main([
        "--task_name=synthetic", "--model_arch=gan", "--image_size=16",
        "--batch_size=8", "--epochs=1", "--log_interval=10",
        "--image_save_interval=50", "--model_save_interval=50",
        f"--results_dir={tmp_path}/results", f"--models_dir={tmp_path}/models",
        "--precision=f32",
    ])
    assert (model_path / "gen_B_final.pth").exists()
    log = (result_path / "training_log.txt").read_text()
    assert "Iter [" in log

def test_scan_unroll_identical(setup, monkeypatch):
    """DISCOGAN_SCAN_UNROLL duplicates the scan body for the scheduler;
    the program must stay numerically identical (same ops, same order
    within each iteration)."""
    import jax
    import jax.numpy as jnp

    from discogan_modernized_tpu.train.step import (
        init_train_state, make_scan_train_step)

    cfg, data_A, data_B, idx_A, idx_B = setup
    K = idx_A.shape[0]
    ts1 = init_train_state(jax.random.PRNGKey(0), cfg)
    ts2 = jax.tree.map(lambda x: x.copy(), ts1)

    monkeypatch.delenv("DISCOGAN_SCAN_UNROLL", raising=False)
    multi1 = make_scan_train_step(cfg, steps=K)
    ts1, L1 = multi1(ts1, data_A, data_B, jnp.asarray(idx_A),
                     jnp.asarray(idx_B), jnp.int32(0))

    monkeypatch.setenv("DISCOGAN_SCAN_UNROLL", "2")
    multi2 = make_scan_train_step(cfg, steps=K)
    ts2, L2 = multi2(ts2, data_A, data_B, jnp.asarray(idx_A),
                     jnp.asarray(idx_B), jnp.int32(0))

    for k in L1:
        np.testing.assert_allclose(np.asarray(L1[k]), np.asarray(L2[k]),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ts1["models"]),
                    jax.tree.leaves(ts2["models"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_scan_unroll_nondivisible_falls_back(setup, monkeypatch):
    """Trip counts not divisible by the unroll factor run the plain loop
    (the trainer clips k near save intervals)."""
    import jax
    import jax.numpy as jnp

    from discogan_modernized_tpu.train.step import (
        init_train_state, make_scan_train_step)

    cfg, data_A, data_B, idx_A, idx_B = setup
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    monkeypatch.setenv("DISCOGAN_SCAN_UNROLL", "4")
    multi = make_scan_train_step(cfg, steps=5)
    ts, L = multi(ts, data_A, data_B, jnp.asarray(idx_A[:5]),
                  jnp.asarray(idx_B[:5]), jnp.int32(0))
    assert all(np.isfinite(np.asarray(v)).all() for v in L.values())


def test_scan_variant_planner():
    """scan_variant: the chunk planner for loop.py/bench.py (round 3 —
    the straight-line phase body, PERF.md)."""
    from discogan_modernized_tpu.train.step import TrainConfig, scan_variant

    cfg = TrainConfig(update_interval=3, log_interval=50)
    assert scan_variant(cfg, 0, 24) == "phase"       # faithful: no cond ever
    assert scan_variant(cfg, 1, 24) == "switch"      # misaligned start
    assert scan_variant(cfg, 0, 8) == "switch"       # partial period
    assert scan_variant(cfg, 3, 3) == "phase"

    lean = TrainConfig(update_interval=3, log_interval=50, lean_dis=True)
    # logged-D iterations are i % lcm(3, 50) == 0, i.e. every 150
    assert scan_variant(lean, 0, 24) == "phase_cond"     # i=0 inside
    assert scan_variant(lean, 24, 24) == "phase"
    assert scan_variant(lean, 144, 24) == "phase_cond"   # i=150 inside
    assert scan_variant(lean, 150, 24) == "phase_cond"   # at the boundary
    assert scan_variant(lean, 153, 24) == "phase"
    # i=50, 100 are G iterations (not % 3 == 0): never logged-D
    assert scan_variant(lean, 48, 24) == "phase"
    assert scan_variant(lean, 99, 24) == "phase"


def test_phase_scan_matches_per_step_trajectory(setup):
    """variant="phase" (straight-line [D,G,G] periods) is step-equal to
    per-step driving — same losses, same weights (faithful mode)."""
    import jax
    import jax.numpy as jnp

    from discogan_modernized_tpu.train.step import (
        init_train_state, make_train_steps, make_scan_train_step)

    cfg, data_A, data_B, idx_A, idx_B = setup
    K = idx_A.shape[0]
    assert K % cfg.update_interval == 0

    ts1 = init_train_state(jax.random.PRNGKey(0), cfg)
    ts2 = jax.tree.map(lambda x: x.copy(), ts1)

    gen_step, dis_step = make_train_steps(cfg)
    ref_losses = []
    for j in range(K):
        A = data_A[idx_A[j]]
        B = data_B[idx_B[j]]
        step = dis_step if cfg.is_dis_iter(j) else gen_step
        ts1, l = step(ts1, A, B, jnp.float32(cfg.rate_for(j)))
        ref_losses.append({k: float(v) for k, v in l.items()})

    multi = make_scan_train_step(cfg, steps=K, variant="phase")
    ts2, L = multi(ts2, data_A, data_B, jnp.asarray(idx_A),
                   jnp.asarray(idx_B), jnp.int32(0))

    for j in range(K):
        for k in ref_losses[j]:
            assert float(L[k][j]) == pytest.approx(ref_losses[j][k],
                                                   rel=2e-3, abs=2e-4), (j, k)
    for a, b in zip(jax.tree.leaves(ts1["models"]),
                    jax.tree.leaves(ts2["models"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_phase_scan_lean_matches_per_step_routing():
    """Lean mode: variant="phase_cond" reproduces the per-step trainer's
    routing exactly (logged-D iterations -> full graph, other D
    iterations -> lean), and variant="phase" matches when no logged-D
    falls in the window."""
    import jax
    import jax.numpy as jnp

    from discogan_modernized_tpu.train.step import (
        TrainConfig, init_train_state, make_train_steps,
        make_lean_dis_step, make_scan_train_step)

    # log_interval=6 puts a logged-D (i % 3 == 0 and i % 6 == 0) inside
    # the first window and none in the second.
    cfg = TrainConfig(image_size=16, model_arch="discogan", precision="f32",
                      gan_curriculum=4, update_interval=3, lean_dis=True,
                      log_interval=6)
    rng = np.random.RandomState(1)
    data_A = jnp.asarray(rng.rand(24, 16, 16, 3), jnp.float32)
    data_B = jnp.asarray(rng.rand(24, 16, 16, 3), jnp.float32)

    gen_step, dis_step = make_train_steps(cfg)
    lean_step = make_lean_dis_step(cfg)

    from discogan_modernized_tpu.train.step import scan_variant

    for start, K, expect in ((0, 6, "phase_cond"), (9, 3, "phase")):
        assert scan_variant(cfg, start, K) == expect
        idx_A = rng.randint(0, 24, size=(K, 4)).astype(np.int32)
        idx_B = rng.randint(0, 24, size=(K, 4)).astype(np.int32)

        ts1 = init_train_state(jax.random.PRNGKey(2), cfg)
        ts2 = jax.tree.map(lambda x: x.copy(), ts1)

        ref_losses = []
        for j in range(start, start + K):
            A = data_A[idx_A[j - start]]
            B = data_B[idx_B[j - start]]
            if cfg.use_lean_dis(j):
                step = lean_step
            elif cfg.is_dis_iter(j):
                step = dis_step
            else:
                step = gen_step
            ts1, l = step(ts1, A, B, jnp.float32(cfg.rate_for(j)))
            ref_losses.append({k: float(v) for k, v in l.items()})

        multi = make_scan_train_step(cfg, steps=K, variant=expect)
        ts2, L = multi(ts2, data_A, data_B, jnp.asarray(idx_A),
                       jnp.asarray(idx_B), jnp.int32(start))

        for j in range(K):
            for k in ref_losses[j]:
                assert float(L[k][j]) == pytest.approx(
                    ref_losses[j][k], rel=2e-3, abs=2e-4), (start, j, k)
        # model_states too: lean vs full D graphs advance BN bookkeeping
        # differently, so state equality proves the routing is identical.
        for a, b in zip(jax.tree.leaves(ts1), jax.tree.leaves(ts2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3)


def test_phase_scan_rejects_partial_periods():
    import pytest as _pytest

    from discogan_modernized_tpu.train.step import (
        TrainConfig, make_scan_train_step)

    cfg = TrainConfig(image_size=16, update_interval=3)
    with _pytest.raises(ValueError):
        make_scan_train_step(cfg, steps=8, variant="phase")
