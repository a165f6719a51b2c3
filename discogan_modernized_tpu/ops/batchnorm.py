"""Batch normalization with torch `nn.BatchNorm2d` train/eval semantics.

The reference uses cuDNN BatchNorm2d after every conv except the first and
last (ref model.py:12-32, :84-176). Semantics reproduced exactly:

- train mode normalizes with the *biased* batch variance over (N,H,W);
- running stats update with momentum 0.1 uses the *unbiased* variance:
  running = (1-m)*running + m*batch_stat;
- eval mode normalizes with running stats;
- eps = 1e-5; scale init 1, bias init 0, running_mean 0, running_var 1.

Under data parallelism the stats are per-replica (computed on the local
shard inside shard_map), matching DDP which does not sync BN
(SURVEY.md §7 "BatchNorm under data parallelism").

State is functional: `batchnorm_apply` returns (y, new_state). Statistics
are always computed in the policy accumulation dtype (f32) regardless of
the bf16 compute dtype, then the normalized output is cast back — the
whole normalize+affine chain is elementwise and fuses into the surrounding
convolution epilogue under XLA. An optional Pallas fused kernel for the
BN-stat reduction lives in ops/pallas_fused.py.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def _use_pallas_stats() -> bool:
    """Opt-in Pallas BN-stat reduction (DISCOGAN_PALLAS_BN=1), TPU only.

    Read at trace time: the cached jitted step programs bake the choice in
    per process. XLA remains the default — it fuses the normalize chain
    into conv epilogues and measured on par or faster (PERF.md); the
    kernel is kept for cases where that fusion breaks.
    """
    if os.environ.get("DISCOGAN_PALLAS_BN") != "1":
        return False
    import jax

    if jax.default_backend() not in ("tpu",):
        return False
    from . import pallas_fused

    return pallas_fused.HAVE_PALLAS


def batchnorm_init(ch: int, dtype=jnp.float32):
    params = {
        "scale": jnp.ones((ch,), dtype),
        "bias": jnp.zeros((ch,), dtype),
    }
    state = {
        "mean": jnp.zeros((ch,), jnp.float32),
        "var": jnp.ones((ch,), jnp.float32),
        "count": jnp.zeros((), jnp.int32),
    }
    return params, state


def _use_remat_stats() -> bool:
    """DISCOGAN_BN_REMAT=1: wrap the training-mode BN in jax.checkpoint so
    the backward recomputes the f32 stats/normalize chain from the bf16
    conv output instead of keeping f32 residuals (x32 and friends) across
    the fusion boundary. The recompute is the same deterministic ops, but
    the VJP graph re-fuses: measured ~1e-9 reduction-order diffs on
    scale/bias grads (CPU check) — i.e. trajectory-exact at f32 rounding,
    NOT bitwise; any default flip re-runs the fidelity suite. A
    bandwidth-vs-FLOPs trade on the epilogue backward — the 0.664
    ms/step BN/act mass named by step_itemize round 3. A/B'd on-chip
    before any default change (PERF.md round 4)."""
    return os.environ.get("DISCOGAN_BN_REMAT") == "1"


def batchnorm_apply(params, state, x, *, training: bool, eps: float = BN_EPS,
                    momentum: float = BN_MOMENTUM, out_dtype=None,
                    axis_name: str | None = None):
    """Apply batch norm to NHWC x. Returns (y, new_state).

    axis_name: if given, batch statistics are averaged across that mesh
    axis (cross-replica "sync BN"); the default None reproduces the
    reference-DDP per-replica behavior.
    """
    if training and axis_name is None and _use_remat_stats():
        import jax

        def core(params, state, x):
            return _batchnorm_train(params, state, x, eps=eps,
                                    momentum=momentum, out_dtype=out_dtype,
                                    axis_name=None)

        return jax.checkpoint(core)(params, state, x)
    if training:
        return _batchnorm_train(params, state, x, eps=eps, momentum=momentum,
                                out_dtype=out_dtype, axis_name=axis_name)
    mean = state["mean"]
    var = state["var"]
    x32 = x.astype(jnp.float32)
    inv = lax.rsqrt(var + eps)
    scale = params["scale"].astype(jnp.float32) * inv
    shift = params["bias"].astype(jnp.float32) - mean * scale
    y = x32 * scale + shift
    y = y.astype(out_dtype if out_dtype is not None else x.dtype)
    return y, state


def _batchnorm_train(params, state, x, *, eps, momentum, out_dtype,
                     axis_name):
    """Training-mode body (see batchnorm_apply)."""
    x32 = x.astype(jnp.float32)
    # One-pass statistics: E[x] and E[x^2] reduce in a single sweep over
    # the activation (the centered two-pass form re-reads it and
    # serializes the conv->BN chain; measured ~1.2x slower per train
    # step on v5e). f32 accumulation keeps the cancellation error of
    # E[x^2]-E[x]^2 ~1e-7 for unit-scale activations, inside the 1e-4
    # fidelity gate (tests/test_fidelity.py).
    if axis_name is None and _use_pallas_stats():
        from .pallas_fused import batch_stats

        mean, var_biased = batch_stats(x32)
        sq_mean = var_biased + jnp.square(mean)
    else:
        mean = jnp.mean(x32, axis=(0, 1, 2))
        sq_mean = jnp.mean(jnp.square(x32), axis=(0, 1, 2))
    n = x.shape[0] * x.shape[1] * x.shape[2]
    if axis_name is not None:
        mean = lax.pmean(mean, axis_name)
        sq_mean = lax.pmean(sq_mean, axis_name)
        n = n * lax.psum(1, axis_name)
    var = jnp.maximum(sq_mean - jnp.square(mean), 0.0)
    unbiased = var * (n / jnp.maximum(n - 1, 1))
    new_state = {
        "mean": (1.0 - momentum) * state["mean"] + momentum * mean,
        "var": (1.0 - momentum) * state["var"] + momentum * unbiased,
        "count": state["count"] + 1,
    }
    inv = lax.rsqrt(var + eps)
    scale = params["scale"].astype(jnp.float32) * inv
    shift = params["bias"].astype(jnp.float32) - mean * scale
    y = x32 * scale + shift
    if out_dtype is not None:
        y = y.astype(out_dtype)
    else:
        y = y.astype(x.dtype)
    return y, new_state
