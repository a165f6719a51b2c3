"""Round-4 fixes: advisor items (mid-band chunking, --remat_policy full
opt-in), the DISCOGAN_BN_REMAT epilogue knob, and the DP-scan abstract
probe avals."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from discogan_modernized_tpu.train.step import (
    TrainConfig, auto_remat_scan_candidate, auto_steps_per_call)


def test_mid_band_sizes_keep_conservative_chunking():
    """Advisor r3: 129-255px must NOT silently get the un-probed 24-step
    chunk regime (the abstract probe only runs at >= LARGE_IMAGE). The
    band keeps the remat-dependent logic: remat-on -> per-step, remat-off
    -> 2 update periods."""
    assert auto_steps_per_call(TrainConfig(image_size=128), 128) == 24
    # auto remat at 192px resolves OFF (image_size < 256) -> 2*ui.
    assert auto_steps_per_call(TrainConfig(image_size=192), 192) == 6
    assert auto_steps_per_call(
        TrainConfig(image_size=192, remat=True), 192) == 1
    assert auto_steps_per_call(
        TrainConfig(image_size=192, remat=False), 192) == 6
    assert auto_steps_per_call(TrainConfig(image_size=256), 256) == 1
    assert auto_steps_per_call(
        TrainConfig(image_size=256, remat=False), 256) == 6


def test_remat_policy_full_opts_into_remat():
    """Advisor r3: --remat_policy full is an explicit remat request; the
    auto-remat candidate must not disable remat for it (nor for any other
    explicitly-passed policy)."""
    assert auto_remat_scan_candidate(
        TrainConfig(image_size=512, remat_policy="full"), 512) is None
    assert auto_remat_scan_candidate(
        TrainConfig(image_size=512, remat_policy="conv"), 512) is None
    # Unset policy: the optimistic no-remat candidate still applies.
    cand = auto_remat_scan_candidate(TrainConfig(image_size=512), 512)
    assert cand is not None and cand[0].remat is False


def test_trainer_passes_remat_policy_full_through(tmp_path):
    """The CLI no longer folds "full" to None before the candidate check:
    graph-wise they are identical, but the candidate must see the user's
    explicit choice (train/loop.py make-config)."""
    from discogan_modernized_tpu.cli.common import (parse_with_config,
                                                    translation_parser)
    from discogan_modernized_tpu.train.loop import config_from_args

    args = parse_with_config(translation_parser(), [
        "--task_name=synthetic", "--image_size=16", "--batch_size=4",
        "--remat_policy=full",
        f"--results_dir={tmp_path}/r", f"--models_dir={tmp_path}/m",
    ])
    cfg = config_from_args(args, False)
    assert cfg.remat_policy == "full"
    assert auto_remat_scan_candidate(
        cfg if cfg.image_size >= 256 else
        TrainConfig(image_size=512, remat_policy=cfg.remat_policy),
        512) is None


def test_bn_remat_knob_is_value_exact(monkeypatch):
    """DISCOGAN_BN_REMAT=1 (epilogue-backward fusion-boundary experiment)
    reproduces the default BN's forward, eval path, running-state update
    and gradients to f32 rounding (<=1e-8; the checkpoint re-fuses the
    VJP, so bitwise equality is not guaranteed — ops/batchnorm.py)."""
    from discogan_modernized_tpu.ops.batchnorm import (batchnorm_apply,
                                                       batchnorm_init)

    p, s = batchnorm_init(8)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 6, 6, 8),
                    jnp.bfloat16)

    def run():
        def f(p, x):
            y, ns = batchnorm_apply(p, s, x, training=True)
            return jnp.sum(y.astype(jnp.float32) ** 2), ns

        (val, ns), g = jax.value_and_grad(f, has_aux=True)(p, x)
        ye, _ = batchnorm_apply(p, s, x, training=False)
        return val, g, ns, ye

    monkeypatch.delenv("DISCOGAN_BN_REMAT", raising=False)
    v1, g1, ns1, ye1 = run()
    monkeypatch.setenv("DISCOGAN_BN_REMAT", "1")
    v2, g2, ns2, ye2 = run()

    # The checkpointed program fuses differently, so reductions
    # reassociate at ~1e-9 even in the forward — equality is at f32
    # rounding, not bitwise.
    assert float(v1) == pytest.approx(float(v2), rel=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    for a, b in zip(jax.tree.leaves(ns1), jax.tree.leaves(ns2)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=1e-7)
    np.testing.assert_allclose(np.asarray(ye1, np.float32),
                               np.asarray(ye2, np.float32), atol=1e-7)


def test_bn_remat_train_step_trajectory(monkeypatch):
    """A short train-step trajectory under DISCOGAN_BN_REMAT stays within
    the standard drift gates vs the default path (same gates as
    test_scan_step): the knob must be routable without semantic change."""
    from discogan_modernized_tpu.train import (TrainConfig,
                                               init_train_state,
                                               make_train_steps)

    def run_steps():
        cfg = TrainConfig(image_size=16, precision="f32")
        gen_step, dis_step = make_train_steps(cfg, jit=True)
        ts = init_train_state(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(1)
        A = jnp.asarray(rng.rand(4, 16, 16, 3), jnp.float32)
        B = jnp.asarray(rng.rand(4, 16, 16, 3), jnp.float32)
        out = []
        for i in range(4):
            step = dis_step if cfg.is_dis_iter(i) else gen_step
            ts, losses = step(ts, A, B, jnp.float32(cfg.rate_for(i)))
            out.append({k: float(v) for k, v in losses.items()})
        return ts, out

    monkeypatch.delenv("DISCOGAN_BN_REMAT", raising=False)
    ts1, l1 = run_steps()
    monkeypatch.setenv("DISCOGAN_BN_REMAT", "1")
    ts2, l2 = run_steps()
    for a, b in zip(l1, l2):
        for k in a:
            assert a[k] == pytest.approx(b[k], rel=1e-3, abs=1e-4), k
    for a, b in zip(jax.tree.leaves(jax.device_get(ts1["models"])),
                    jax.tree.leaves(jax.device_get(ts2["models"]))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_s2d_stem_matches_plain_conv(monkeypatch):
    """DISCOGAN_S2D_STEM=1 (thin-channel stem conv as k3/s1 on the
    space-to-depth transform — the 512px enc0/dis0 emitter attack) is
    exact to f32 rounding in fwd, dx and dw, across the gated shapes."""
    from discogan_modernized_tpu.ops import conv as C

    rng = np.random.RandomState(0)
    for (h, ci, co) in ((16, 3, 8), (32, 3, 64), (16, 12, 32)):
        x = jnp.asarray(rng.randn(2, h, h, ci), jnp.float32)
        w = jnp.asarray(rng.randn(4, 4, ci, co) * 0.1, jnp.float32)

        def loss(x, w):
            return jnp.sum(jnp.sin(C.conv2d(x, w, stride=2, padding=1)))

        monkeypatch.delenv("DISCOGAN_S2D_STEM", raising=False)
        y0 = C.conv2d(x, w, stride=2, padding=1)
        g0 = jax.grad(loss, argnums=(0, 1))(x, w)
        monkeypatch.setenv("DISCOGAN_S2D_STEM", "1")
        y1 = C.conv2d(x, w, stride=2, padding=1)
        g1 = jax.grad(loss, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g0[0]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]),
                                   atol=1e-3)
    # Wide-input convs must NOT take the stem path (gate cin <= 16).
    x = jnp.asarray(rng.randn(2, 8, 8, 64), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, 64, 32) * 0.1, jnp.float32)
    monkeypatch.setenv("DISCOGAN_S2D_STEM", "1")
    y = C.conv2d(x, w, stride=2, padding=1)
    assert y.shape == (2, 4, 4, 32)


def test_sr_rbg_rounding_unbiased_and_deterministic(monkeypatch):
    """DISCOGAN_SR_RBG=1 (hardware-RBG stochastic-rounding bits for the
    slim-all bf16 master writes) keeps the two properties the scheme
    needs: E[round(x)] = x to sampling error, and bitwise determinism
    for a fixed (step, leaf) key — resume-safe like the threefry path."""
    from discogan_modernized_tpu.train.optim import _stochastic_round_bf16

    key = jax.random.PRNGKey(7)
    x = jnp.asarray(np.random.RandomState(0).randn(4096).astype(np.float32)
                    * 0.01)
    for knob in ("0", "1"):
        if knob == "1":
            monkeypatch.setenv("DISCOGAN_SR_RBG", "1")
        else:
            monkeypatch.delenv("DISCOGAN_SR_RBG", raising=False)
        f = jax.jit(lambda x, k: _stochastic_round_bf16(x, k))
        outs = np.stack([np.asarray(f(x, jax.random.fold_in(key, i)),
                                    np.float32) for i in range(64)])
        bias = np.abs(outs.mean(0) - np.asarray(x)).max()
        assert bias < 2e-4, (knob, bias)  # |x| ~ 1e-2, bf16 ulp ~ 4e-5
        a = np.asarray(f(x, key))
        assert np.array_equal(a, np.asarray(f(x, key))), knob


def test_subpixel_wide_hi_is_exact(monkeypatch):
    """DISCOGAN_SUBPIXEL_WIDE=hi (dense-form convT gated to wide-spatial
    inputs only — the round-4 retry after "1" failed to compile at
    512px) stays numerically exact vs the dilated emitter on both sides
    of the spatial gate."""
    from discogan_modernized_tpu.ops import conv as C

    rng = np.random.RandomState(0)
    for h in (64, 16):  # >= 64: dense form; < 64: dilated emitter
        x = jnp.asarray(rng.randn(2, h, h, 32), jnp.float32)
        w = jnp.asarray(rng.randn(4, 4, 32, 24) * 0.1, jnp.float32)
        monkeypatch.delenv("DISCOGAN_SUBPIXEL_WIDE", raising=False)
        y0 = C.conv_transpose2d(x, w, stride=2, padding=1)
        monkeypatch.setenv("DISCOGAN_SUBPIXEL_WIDE", "hi")
        y1 = C.conv_transpose2d(x, w, stride=2, padding=1)
        assert y1.shape == y0.shape == (2, 2 * h, 2 * h, 24)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   atol=1e-4)


def test_dp_scan_probe_uses_mesh_avals(monkeypatch, tmp_path):
    """Round-4 (VERDICT r3 item 6): at >= LARGE_IMAGE under a DP mesh the
    trainer probe-compiles the DP-scan program from mesh-sharded avals
    BEFORE device_data_sharded allocates; a probe failure falls back to
    the per-step path without ever building the device dataset."""
    import discogan_modernized_tpu.train.loop as loop_mod
    from discogan_modernized_tpu.data.pipeline import PrefetchLoader

    built = {"n": 0}
    real_build = PrefetchLoader.device_data_sharded

    def spy_build(self, mesh):
        built["n"] += 1
        return real_build(self, mesh)

    monkeypatch.setattr(PrefetchLoader, "device_data_sharded", spy_build)

    # Force the probe to fail by making LARGE_IMAGE cover the test size —
    # the probe then compiles the real (tiny) program, which SUCCEEDS; so
    # instead stub the compile to raise, asserting ordering.
    from discogan_modernized_tpu.train import step as step_mod

    monkeypatch.setattr(step_mod, "LARGE_IMAGE", 16)

    compiled = {"probed": 0}
    import discogan_modernized_tpu.parallel as par

    real_scan = par.make_dp_scan_train_step

    def failing_scan(*a, **kw):
        prog = real_scan(*a, **kw)

        class Fail:
            def lower(self, *args, **kwargs):
                compiled["probed"] += 1
                assert built["n"] == 0, \
                    "device dataset built before the probe ran"
                raise RuntimeError("simulated compile OOM")

            def __call__(self, *args, **kwargs):
                return prog(*args, **kwargs)

        return Fail()

    monkeypatch.setattr(par, "make_dp_scan_train_step", failing_scan)

    from discogan_modernized_tpu.cli.distributed_image_translation import main

    result_path, _ = main([
        "--task_name=synthetic", "--model_arch=gan", "--image_size=16",
        "--batch_size=8", "--epochs=1", "--distributed", "--world_size=8",
        "--parallel_mode=dp", "--log_interval=8",
        "--image_save_interval=1000000", "--model_save_interval=1000000",
        f"--results_dir={tmp_path}/r", f"--models_dir={tmp_path}/m",
        "--precision=f32",
    ])
    assert compiled["probed"] >= 1, "DP-scan probe never ran"
    assert built["n"] == 0, \
        "probe failure must not leave a built device dataset"
    assert (result_path / "training_log.txt").exists()
