"""Blocked Pallas conv kernel for the k=4 / s=2 / p=1 "halving" layers.

Every conv in the architecture is this shape (ref model.py:8-35 — cuDNN
carries them in the reference); XLA's conv emitter holds 37-62% MFU on the
wide backward layers and the step MFU at 42/49% (PERF.md round-2 roofline
work), so this is the one prescribed weapon left (SURVEY §7: "fuse
conv+BN+LeakyReLU blocks with a Pallas kernel where XLA fusion is
insufficient").

Design (see /opt/skills/guides/pallas_guide.md):
- Grid (batch tiles, out-channel tiles); each step owns TB batch items
  and TO output channels. The whole (padded) spatial extent of those
  items rides in VMEM — at 64px every layer fits; at 512px the early
  layers cap TB at 1.
- Per (kh, kw) tap: a strided VMEM slice x[:, kh::2, kw::2, :] flattened
  to (TB*Ho*Wo, I) feeds ONE MXU matmul against w[kh, kw] (I, TO), f32
  accumulation. 16 taps = 16 matmuls per grid step. Contraction K = I
  (full lanes for the >=128-channel layers) and M = TB*Ho*Wo — batching
  TB items per step keeps M >= 128 even for the 4x4-spatial late layers
  where XLA's emitter starves the MXU.
- Optional fused epilogue: per-channel scale/offset + activation
  (BN-normalize in inference/eval form), and a fused batch-stat partial
  reduction (sum, sum of squares per channel) emitted alongside y so
  train-mode BN needs no second read of the conv output.

Correctness is exact to f32-accumulation reordering vs
lax.conv_general_dilated (tests/test_pallas_conv.py, interpret mode on
CPU + compiled on the real chip via bench/kernel tools).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tb(n: int, h: int, w: int, in_ch: int, itemsize: int,
             vmem_budget: int = 8 * 2 ** 20, m_cap: int = 1024) -> int:
    """Largest batch tile whose padded input block fits the VMEM budget
    AND whose flattened matmul M dim (tb * ho * wo) stays under m_cap —
    oversized unrolled tiles blow up Mosaic compile memory (observed:
    compile-helper OOM-kill on the 64px first layer at tb=64)."""
    per_item = (h + 2) * (w + 2) * in_ch * itemsize
    tb = max(1, vmem_budget // max(per_item, 1))
    m_item = max((h // 2) * (w // 2), 1)
    tb = min(tb, max(1, m_cap // m_item), n)
    while n % tb:
        tb -= 1
    return max(1, tb)


def _pick_to(out_ch: int) -> int:
    if out_ch % 128 == 0:
        return 128
    return out_ch  # 3/100-channel heads: single tile


def conv2d_k4s2p1(x, w, *, scale=None, offset=None, act: str | None = None,
                  with_stats: bool = False, interpret: bool = False):
    """y = conv(x, w, k=4, s=2, p=1) with optional fused epilogue.

    x: (N, H, W, I) NHWC; w: (4, 4, I, O) HWIO. Returns y (N, H/2, W/2, O)
    or (y, (mean, mean_sq)) when with_stats=True: per-channel f32 MEANS
    of y and y^2 over the N*Ho*Wo axis (already divided by the count —
    var = mean_sq - mean^2; pinned by tests/test_pallas_conv.py).

    scale/offset: per-channel f32 y*scale + offset applied before act
    (inference-form BN); act: None | "relu" | "leaky" (0.2, the reference
    slope, model.py:9).
    """
    n, h, wd, in_ch = x.shape
    assert w.shape[:3] == (4, 4, in_ch), (x.shape, w.shape)
    assert h % 2 == 0 and wd % 2 == 0, (
        f"conv2d_k4s2p1 requires even spatial dims (column-parity split), "
        f"got {h}x{wd}")
    out_ch = w.shape[-1]
    ho, wo = h // 2, wd // 2
    dtype = x.dtype
    w = w.astype(dtype)

    tb = _pick_tb(n, h, wd, in_ch, jnp.dtype(dtype).itemsize)
    to = _pick_to(out_ch)
    grid = (n // tb, out_ch // to)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # Column-parity split OUTSIDE the kernel: a (…, 2, C)-minor reshape
    # inside Mosaic tiles at ~16x padding (observed 22MB scoped-VMEM OOM
    # for a 0.6MB block). Splitting W into even/odd arrays up front keeps
    # the kernel's minor dims (W/2, C) natively tileable; the row parity
    # is a MAJOR-dim reshape in-kernel (free). XLA emits the two strided
    # slices as one cheap relayout of the padded copy it makes anyway.
    xe = xp[:, :, 0::2, :]  # (N, H+2, wo+1, I)
    xo = xp[:, :, 1::2, :]
    has_affine = scale is not None
    if has_affine:
        scale2 = jnp.broadcast_to(scale.astype(jnp.float32),
                                  (out_ch,)).reshape(1, out_ch)
        offset2 = jnp.broadcast_to(offset.astype(jnp.float32),
                                   (out_ch,)).reshape(1, out_ch)

    def kernel(*refs):
        if has_affine:
            xe_ref, xo_ref, w_ref, s_ref, o_ref = refs[:5]
            rest = refs[5:]
        else:
            xe_ref, xo_ref, w_ref = refs[:3]
            rest = refs[3:]
        if with_stats:
            y_ref, sum_ref, sq_ref = rest
        else:
            (y_ref,) = rest

        # Row parity via a major-dim reshape (no minor-layout change):
        # (TB, H+2, wo+1, I) -> (TB, ho+1, 2, wo+1, I). Tap (kh, kw)
        # reads row parity kh%2 at row offset kh//2 from the column-
        # parity array kw%2 at column offset kw//2 — all static slices.
        xs = [r[...].reshape(tb, ho + 1, 2, wo + 1, in_ch)
              for r in (xe_ref, xo_ref)]
        acc = jnp.zeros((tb * ho * wo, to), jnp.float32)
        for kh in range(4):
            for kw in range(4):
                sh, a = divmod(kh, 2)
                sw, b = divmod(kw, 2)
                xt = xs[b][:, sh:sh + ho, a, sw:sw + wo, :]
                xt = xt.reshape(tb * ho * wo, in_ch)
                acc = acc + jax.lax.dot_general(
                    xt, w_ref[kh, kw],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        if with_stats:
            # Partial reduction over this tile's M rows; finalized by the
            # caller (sum over batch-grid). Channel stats are of the RAW
            # conv output (what train-mode BN normalizes, ops/batchnorm).
            sum_ref[0, :] = jnp.sum(acc, axis=0)
            sq_ref[0, :] = jnp.sum(jnp.square(acc), axis=0)
        out = acc
        if has_affine:
            out = out * s_ref[...] + o_ref[...]
        if act == "relu":
            out = jnp.maximum(out, 0.0)
        elif act == "leaky":
            out = jnp.where(out >= 0.0, out, 0.2 * out)
        y_ref[...] = out.reshape(tb, ho, wo, to).astype(dtype)

    in_specs = [
        pl.BlockSpec((tb, h + 2, wo + 1, in_ch),
                     lambda b, c: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, h + 2, wo + 1, in_ch),
                     lambda b, c: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, 4, in_ch, to), lambda b, c: (0, 0, 0, c),
                     memory_space=pltpu.VMEM),
    ]
    args = [xe, xo, w]
    if has_affine:
        in_specs += [
            pl.BlockSpec((1, to), lambda b, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, to), lambda b, c: (0, c),
                         memory_space=pltpu.VMEM),
        ]
        args += [scale2, offset2]

    out_shape = [jax.ShapeDtypeStruct((n, ho, wo, out_ch), dtype)]
    out_specs = [pl.BlockSpec((tb, ho, wo, to), lambda b, c: (b, 0, 0, c),
                              memory_space=pltpu.VMEM)]
    if with_stats:
        out_shape += [
            jax.ShapeDtypeStruct((n // tb, out_ch), jnp.float32),
            jax.ShapeDtypeStruct((n // tb, out_ch), jnp.float32),
        ]
        out_specs += [
            pl.BlockSpec((1, to), lambda b, c: (b, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, to), lambda b, c: (b, c),
                         memory_space=pltpu.VMEM),
        ]

    flops = 2 * n * ho * wo * out_ch * in_ch * 16
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if with_stats else out_specs[0],
        out_shape=out_shape if with_stats else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xp.size + w.size) * xp.dtype.itemsize
            + n * ho * wo * out_ch * xp.dtype.itemsize,
            transcendentals=0,
        ),
        # round 5: Mosaic's 16 MB scoped default blocked every 512px
        # shape (tb=1 input block alone is 42.3 MB at enc1 geometry);
        # the v5e has 128 MB physical VMEM — lift the limit so the
        # 512px shapes compile at all (PERF.md round-4 item re-tested)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if with_stats:
        y, psum, psq = result
        cnt = n * ho * wo
        return y, (jnp.sum(psum, axis=0) / cnt, jnp.sum(psq, axis=0) / cnt)
    return result


def conv2d_k4s2p1_dw(x, dy, *, interpret: bool = False):
    """Weight gradient of the k4/s2/p1 conv as 16 blocked MXU matmuls.

    dw[kh,kw,i,o] = sum_{b,r,c} x_p[b, 2r+kh, 2c+kw, i] * dy[b,r,c,o]
    — per tap, an (I, M) x (M, O) contraction with M = TB*Ho*Wo. The
    batch grid accumulates partial dw tiles which the caller sums (f32).
    """
    n, h, wd, in_ch = x.shape
    _, ho, wo, out_ch = dy.shape
    dtype = x.dtype
    tb = _pick_tb(n, h, wd, in_ch, jnp.dtype(dtype).itemsize,
                  vmem_budget=8 * 2 ** 20)
    to = _pick_to(out_ch)
    grid = (n // tb, out_ch // to)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xe = xp[:, :, 0::2, :]  # column-parity split (see conv2d_k4s2p1)
    xo = xp[:, :, 1::2, :]

    def kernel(xe_ref, xo_ref, dy_ref, dw_ref):
        xs = [r[...].reshape(tb, ho + 1, 2, wo + 1, in_ch)
              for r in (xe_ref, xo_ref)]
        dyb = dy_ref[...].reshape(tb * ho * wo, to)
        for kh in range(4):
            for kw in range(4):
                sh, a = divmod(kh, 2)
                sw, b = divmod(kw, 2)
                xt = xs[b][:, sh:sh + ho, a, sw:sw + wo, :]
                xt = xt.reshape(tb * ho * wo, in_ch)
                dw_ref[0, kh, kw] = jax.lax.dot_general(
                    xt, dyb,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    dw_parts = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, h + 2, wo + 1, in_ch),
                         lambda b, c: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, h + 2, wo + 1, in_ch),
                         lambda b, c: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, ho, wo, to), lambda b, c: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, 4, in_ch, to),
                               lambda b, c: (b, 0, 0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // tb, 4, 4, in_ch, out_ch),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ho * wo * out_ch * in_ch * 16,
            bytes_accessed=(xp.size + dy.size) * xp.dtype.itemsize
            + 16 * in_ch * out_ch * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xe, xo, dy)
    return jnp.sum(dw_parts, axis=0).astype(dtype)
