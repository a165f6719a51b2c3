"""Pallas TPU kernels for the hot elementwise/reduction paths.

The conv FLOPs live on the MXU via XLA; what remains HBM-bandwidth-bound
is the BatchNorm chain around every conv (ref model.py applies BN+activation
after 15 of 17 generator layers). XLA compiles train-mode BN as a reduce
pass plus a normalize pass over the activation; the fused kernel here does
one tiled read producing both the batch statistics and the normalized,
activated output: for each (HW-tile, C-tile) grid cell it accumulates
sum/sumsq into a scratch accumulator on the first grid row, finalizes
mean/var, then normalizes in the same kernel — halving activation traffic
for the stat pass.

`fused_batchnorm_act` is a drop-in for the batchnorm_apply + activation
pair in inference/eval mode (stats given), and `batch_stats` computes the
train-mode reduction. `batch_stats` is consumed by ops.batchnorm's
batchnorm_apply when DISCOGAN_PALLAS_BN=1 on a TPU backend (see
`_use_pallas_stats` there); numerically validated against the reference
path in tests/test_pallas.py (interpret mode on CPU, compiled on a real
TPU) and benchmarked in tools/kernel_bench.py. The default path remains
XLA (which already fuses the normalize into conv epilogues and measured
on par or faster — PERF.md); the kernel exists for the cases where XLA's
fusion breaks (large 512px activations, remat boundaries).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pragma: no cover - pallas availability probe
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _stats_kernel(x_ref, sum_ref, sq_ref):
    """Accumulate per-channel sum and sum-of-squares over grid rows."""
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)

    @pl.when(i == 0)
    def _():
        sum_ref[:] = jnp.zeros_like(sum_ref)
        sq_ref[:] = jnp.zeros_like(sq_ref)

    sum_ref[:] += jnp.sum(x, axis=0, keepdims=True)
    sq_ref[:] += jnp.sum(jnp.square(x), axis=0, keepdims=True)


def batch_stats(x, *, tile_rows: int = 512, interpret: bool = False):
    """Per-channel (mean, biased var) of a (N,H,W,C) array via one tiled
    Pallas pass. Returns float32 (C,), (C,)."""
    n, h, w, c = x.shape
    rows = n * h * w
    x2 = x.reshape(rows, c)
    tr = min(tile_rows, rows)
    # Pad rows to a tile multiple (zeros contribute zero to both sums).
    pad = (-rows) % tr
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    grid = (x2.shape[0] // tr,)

    s, sq = pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tr, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=interpret,
    )(x2)
    mean = s[0] / rows
    var = sq[0] / rows - jnp.square(mean)
    return mean, jnp.maximum(var, 0.0)


def _bn_act_kernel(x_ref, scale_ref, shift_ref, out_ref, *, act: str,
                   negative_slope: float):
    x = x_ref[:].astype(jnp.float32)
    y = x * scale_ref[:] + shift_ref[:]
    if act == "leaky_relu":
        y = jnp.where(y >= 0, y, y * negative_slope)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.astype(out_ref.dtype)


def fused_batchnorm_act(x, mean, var, scale, bias, *, eps: float = 1e-5,
                        act: str = "leaky_relu", negative_slope: float = 0.2,
                        tile_rows: int = 512, out_dtype=None,
                        interpret: bool = False):
    """normalize + affine + activation in one tiled pass.

    x: (N,H,W,C); mean/var/scale/bias: (C,). act: leaky_relu|relu|none.
    """
    n, h, w, c = x.shape
    rows = n * h * w
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    eff_scale = (scale.astype(jnp.float32) * inv)[None, :]
    eff_shift = (bias.astype(jnp.float32)
                 - mean.astype(jnp.float32) * scale.astype(jnp.float32) * inv)[None, :]

    x2 = x.reshape(rows, c)
    tr = min(tile_rows, rows)
    pad = (-rows) % tr
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    grid = (x2.shape[0] // tr,)
    out_dtype = out_dtype or x.dtype

    y = pl.pallas_call(
        functools.partial(_bn_act_kernel, act=act,
                          negative_slope=negative_slope),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, out_dtype),
        interpret=interpret,
    )(x2, eff_scale, eff_shift)
    if pad:
        y = y[:rows]
    return y.reshape(n, h, w, c)
