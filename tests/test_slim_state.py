"""Slim (low-precision) optimizer/master state — the 512px HBM-ceiling
breaker (PERF.md). Verifies dtype layout, trajectory closeness to the f32
state, unbiasedness of the stochastic bf16 rounding, and checkpoint
round-trips through both the npz full-state path and the reference .pth
layout."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from discogan_modernized_tpu.train.step import (
    TrainConfig, init_train_state, make_train_steps, resolve_slim_state,
)
from discogan_modernized_tpu.train.optim import _stochastic_round_bf16


SIZE = 16
BATCH = 4


def _cfg(slim):
    return TrainConfig(image_size=SIZE, gan_curriculum=5,
                       precision="f32", slim_state=slim)


def _rand_batch(seed):
    rng = np.random.RandomState(seed)
    return (rng.rand(BATCH, SIZE, SIZE, 3).astype(np.float32),
            rng.rand(BATCH, SIZE, SIZE, 3).astype(np.float32))


def _run(slim, steps=24):
    cfg = _cfg(slim)
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    gen_step, dis_step = make_train_steps(cfg)
    history = []
    for i in range(steps):
        A, B = _rand_batch(i)
        rate = jnp.float32(cfg.rate_for(i))
        step = dis_step if cfg.is_dis_iter(i) else gen_step
        ts, losses = step(ts, A, B, rate)
        history.append({k: float(v) for k, v in losses.items()})
    return ts, history


def test_resolve_slim_state_env(monkeypatch):
    assert resolve_slim_state(_cfg(None)) == "off"
    assert resolve_slim_state(_cfg("mv")) == "mv"
    assert resolve_slim_state(_cfg("all")) == "all"
    monkeypatch.setenv("DISCOGAN_SLIM_STATE", "all")
    assert resolve_slim_state(_cfg(None)) == "all"
    # An explicit cfg value wins over a leftover env var (a stray export
    # must not silently reconfigure a run that named its state).
    monkeypatch.setenv("DISCOGAN_SLIM_STATE", "off")
    assert resolve_slim_state(_cfg("all")) == "all"
    monkeypatch.delenv("DISCOGAN_SLIM_STATE")
    with pytest.raises(ValueError):
        resolve_slim_state(_cfg("fp8"))


def test_state_dtypes():
    for slim, mv_dt, p_dt in [(None, jnp.float32, jnp.float32),
                              ("mv", jnp.bfloat16, jnp.float32),
                              ("all", jnp.bfloat16, jnp.bfloat16)]:
        ts = init_train_state(jax.random.PRNGKey(0), _cfg(slim))
        m_leaves = jax.tree.leaves(ts["opt_gen"]["m"])
        assert all(l.dtype == mv_dt for l in m_leaves), slim
        p_leaves = jax.tree.leaves(ts["models"])
        assert all(l.dtype == p_dt for l in p_leaves), slim
        # BN running stats stay f32 in every mode (EMA precision); the
        # int32 num_batches_tracked counters are untouched.
        s_leaves = jax.tree.leaves(ts["model_states"])
        assert all(l.dtype == jnp.float32 for l in s_leaves
                   if jnp.issubdtype(l.dtype, jnp.floating)), slim


def test_mv_trajectory_tracks_f32():
    """bf16 moments perturb the trajectory only at rounding scale over a
    short window."""
    _, hist_f32 = _run(None)
    _, hist_mv = _run("mv")
    for h32, hmv in zip(hist_f32[-4:], hist_mv[-4:]):
        for k in h32:
            assert np.isfinite(hmv[k])
            assert abs(h32[k] - hmv[k]) <= 0.05 * (abs(h32[k]) + 1e-3), (
                k, h32[k], hmv[k])


def test_all_mode_trains():
    """bf16 master params + stochastic rounding: finite losses, params
    move, and the generator loss lands in the same regime as f32."""
    ts0 = init_train_state(jax.random.PRNGKey(0), _cfg("all"))
    ts, hist = _run("all")
    assert all(np.isfinite(v) for h in hist for v in h.values())
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                           - b.astype(jnp.float32)))),
        ts0["models"], ts["models"])
    assert max(jax.tree.leaves(moved)) > 0
    _, hist_f32 = _run(None)
    # Same order of magnitude at the end of the window (GAN losses are
    # noisy; this is a regime check, not a bitwise gate).
    assert abs(hist[-1]["gen_total"] - hist_f32[-1]["gen_total"]) < 0.5


def test_stochastic_round_unbiased():
    # x sits 1/4 of the way between two bf16 representables around 1.0
    # (7 mantissa bits -> ulp 2^-7 in [1, 2)): round-down must happen
    # ~3/4 of the time and the mean must recover x.
    lo, hi = 1.0, 1.0 + 2.0 ** -7
    x = np.float32(lo + (hi - lo) * 0.25)
    n = 4096
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    vals = jax.vmap(
        lambda k: _stochastic_round_bf16(jnp.full((4,), x), k))(keys)
    vals = np.asarray(vals, np.float32).ravel()
    assert set(np.unique(vals)) <= {np.float32(lo), np.float32(hi)}
    frac_hi = float((vals == np.float32(hi)).mean())
    assert abs(frac_hi - 0.25) < 0.03
    assert abs(vals.mean() - x) < (hi - lo) * 0.05
    # Round-to-nearest (the failure mode this replaces) would be stuck:
    assert np.float32(jnp.asarray(x, jnp.bfloat16)) == np.float32(lo)


def test_checkpoint_roundtrip_npz(tmp_path):
    from discogan_modernized_tpu.train.checkpoint import (
        save_train_state, load_train_state, save_reference_layout)

    cfg = _cfg("all")
    ts, _ = _run("all", steps=6)
    save_train_state(tmp_path, ts, 6, {"task": "t", "arch": "discogan"})
    template = init_train_state(jax.random.PRNGKey(1), cfg)
    restored, iters = load_train_state(tmp_path, template)
    assert iters == 6
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a, np.float32),
                                                   np.asarray(b, np.float32)),
        ts, restored)
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(restored)):
        assert a.dtype == b.dtype

    # Reference .pth layout: bf16 exports as f32 and loads back.
    save_reference_layout(tmp_path, ts, "final")
    import torch

    sd = torch.load(tmp_path / "gen_A_final.pth", map_location="cpu",
                    weights_only=True)
    for k, v in sd.items():
        if v.is_floating_point():
            assert v.dtype == torch.float32, k
