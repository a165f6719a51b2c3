"""Spatially-tiled halo-reuse Pallas conv for the k4/s2/p1 boundary
layers (enc1/dis1: 64->128 at 256px input — ref model.py:84-96's second
conv block at the 512px geometry).

Why (round-4 itemization + round-5 decompositions, PERF.md): XLA's
emitter holds 26-29% MFU on this shape — k4s2 halo re-reads ~2.5x over
the operand floor — and every HLO-reachable reformulation measured
negative (s2d form 2.1x worse, round 5; subpixel-wide does not
compile). The round-2 blocked kernel (batch-tiled, full spatial) runs
3.2x slower here. This kernel applies the two layout preconditions the
round-5 head-kernel work established:
  1. input arrives in a 128-lane packing — the (W/2, 2*CI) column-pair
     view, a free row-major bitcast — because 64-lane-minor blocks
     stream at HALF the block-pipeline rate;
  2. everything downstream of the matmuls stays lane-dense (out_ch=128
     on lanes; no interleave, no narrow-lane ops).

Structure: grid (N, H-tiles). Each step reads 2*TO+2 input rows (two
1-row clamped halo blocks + one 2*TO main block), and computes the k4s2
conv as 12 K=128 matmuls: per row tap kh (stride-2 major slices), the
column taps kw=1,2 hit pair c directly (full-K matmul), kw=0 hits pair
c-1's hi half (half-zero weights, result rolled +1 column), kw=3 hits
pair c+1's lo half (rolled -1). Rolls are f32 on the accumulator
(sublane axis), wraps masked to implement the p=1 zero padding.
Optional fused epilogue: per-channel scale/offset + activation.

Correctness: exact to f32-accumulation reordering vs
lax.conv_general_dilated (tests/test_pallas_halo_conv.py, interpret on
CPU + compiled on chip via the benchmark's guard).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_to(ho: int) -> int:
    import os

    to = min(int(os.environ.get("DISCOGAN_HALO_TO", "16")), ho)
    while ho % to:
        to -= 1
    return to


def halo_conv2d_k4s2p1(x, w, *, scale=None, offset=None,
                       act: str | None = None,
                       interpret: bool = False):
    """y = conv(x, w, k=4, s=2, p=1), NHWC/HWIO, for even H, W and
    CI/CO multiples of 8 with 2*CI <= 256. Optional fused epilogue:
    y*scale + offset then act in {None, 'relu', 'leaky'}."""
    n, h, wd, ci = x.shape
    assert w.shape[:3] == (4, 4, ci), (x.shape, w.shape)
    co = w.shape[-1]
    assert h % 2 == 0 and wd % 2 == 0, (h, wd)
    dtype = x.dtype
    w = w.astype(dtype)
    ho, wo = h // 2, wd // 2

    to = _pick_to(ho)
    nt = ho // to
    lane = 2 * ci

    # column-pair view: (N, H, W/2, 2*CI), free row-major bitcast
    x2 = x.reshape(n, h, wo, lane)

    # weights per row tap kh, split by which pair the column tap reads:
    #   WA[kh][(v*CI+ci), o] = w[kh, 1+v, ci, o]   (pair c: lo=kw1, hi=kw2)
    #   WP[kh][(1*CI+ci), o] = w[kh, 0,  ci, o]    (pair c-1 hi -> col c)
    #   WN[kh][(0*CI+ci), o] = w[kh, 3,  ci, o]    (pair c+1 lo -> col c)
    wa = jnp.concatenate([w[:, 1], w[:, 2]], axis=1)          # (4, 2CI, CO)
    wp = jnp.concatenate([jnp.zeros_like(w[:, 0]), w[:, 0]], axis=1)
    wn = jnp.concatenate([w[:, 3], jnp.zeros_like(w[:, 3])], axis=1)
    # one (2CI, 3*CO) weight per row tap: N-concat keeps it a single
    # matmul per kh; the class splits afterwards are CO-aligned lane
    # slices (clean layouts)
    wcat = jnp.concatenate([wa, wp, wn], axis=2)  # (4, 2CI, 3*CO)

    has_affine = scale is not None
    if has_affine:
        sc2 = jnp.broadcast_to(scale.astype(jnp.float32), (co,)).reshape(1, co)
        of2 = jnp.broadcast_to(offset.astype(jnp.float32), (co,)).reshape(1, co)

    def kernel(*refs):
        if has_affine:
            lo_ref, xm_ref, hi_ref, w_ref, s_ref, o_ref, y_ref = refs
        else:
            lo_ref, xm_ref, hi_ref, w_ref, y_ref = refs
        i = pl.program_id(1)

        zrow = jnp.zeros((1, wo, lane), dtype)
        xl = jnp.where(i == 0, zrow, lo_ref[0])
        xh = jnp.where(i == nt - 1, zrow, hi_ref[0])
        # xall row p = x row (2*i*TO - 1 + p); out local row q reads
        # xall rows 2q + kh, kh = 0..3
        xall = jnp.concatenate([xl, xm_ref[0], xh], axis=0)

        m = to * wo
        # stride-2 row slabs via a major-dim parity reshape (compiled
        # Mosaic rejects strided vector slices): rows 2q+kh live at
        # parity kh%2, major index q + kh//2
        xpar = xall.reshape(to + 1, 2, wo, lane)
        acc = jnp.zeros((m, 3 * co), jnp.float32)
        for kh in range(4):
            slab = xpar[kh // 2:kh // 2 + to, kh % 2].reshape(m, lane)
            acc = acc + jax.lax.dot_general(
                slab, w_ref[kh],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc = acc.reshape(to, wo, 3 * co)
        acc_a = acc[:, :, 0:co]
        acc_p = acc[:, :, co:2 * co]
        acc_n = acc[:, :, 2 * co:3 * co]

        col = jax.lax.broadcasted_iota(jnp.int32, (to, wo, co), 1)
        # P contributes to col c+1 (roll +1; col 0's source is the left
        # zero pad); N to col c-1 (roll -1; col wo-1's source is the
        # right zero pad)
        accp = jnp.where(col == 0, 0.0, pltpu.roll(acc_p, 1, 1))
        accn = jnp.where(col == wo - 1, 0.0, pltpu.roll(acc_n, wo - 1, 1))
        out = acc_a + accp + accn
        if has_affine:
            out = out * s_ref[...] + o_ref[...]
        if act == "relu":
            out = jnp.maximum(out, 0.0)
        elif act == "leaky":
            out = jnp.where(out >= 0.0, out, 0.2 * out)
        y_ref[0] = out.astype(dtype)

    in_specs = [
        pl.BlockSpec((1, 1, wo, lane),
                     lambda b, i: (b, jnp.maximum(2 * i * to - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2 * to, wo, lane), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, wo, lane),
                     lambda b, i: (b, jnp.minimum(2 * i * to + 2 * to, h - 1),
                                   0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, lane, 3 * co), lambda b, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [x2, x2, x2, wcat]
    if has_affine:
        in_specs += [
            pl.BlockSpec((1, co), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [sc2, of2]

    flops = 2 * n * ho * wo * co * ci * 16
    return pl.pallas_call(
        kernel,
        grid=(n, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, to, wo, co), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, co), dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(x.size + w.size
                            + n * ho * wo * co) * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def halo_conv2d_k4s2p1_dw(x, dy, *, interpret: bool = False):
    """Weight gradient of the k4/s2/p1 conv, same tiling/packing.

    dw[kh, kw, ci, o] = sum_{b, q, c} x[b, 2q+kh-1, 2c+kw-1, ci]
                                      * dy[b, q, c, o]
    Per (kh, column-tap-class): one M-contraction matmul per tile,
    accumulated across the grid (sequential on TPU). The column classes
    pair x's lane halves with dy shifted by 0/-1/+1 columns — the shifts
    are applied to dy (f32-cast) with masked wraps, mirroring fwd.
    """
    n, h, wd, ci = x.shape
    _, ho, wo, co = dy.shape
    dtype = x.dtype
    lane = 2 * ci
    to = _pick_to(ho)
    nt = ho // to
    x2 = x.reshape(n, h, wo, lane)

    def kernel(lo_ref, xm_ref, hi_ref, dy_ref, dw_ref):
        i = pl.program_id(1)
        b = pl.program_id(0)

        zrow = jnp.zeros((1, wo, lane), dtype)
        xl = jnp.where(i == 0, zrow, lo_ref[0])
        xh = jnp.where(i == nt - 1, zrow, hi_ref[0])
        xall = jnp.concatenate([xl, xm_ref[0], xh], axis=0)

        dyv = dy_ref[0].astype(jnp.float32)  # (TO, WO, CO)
        col = jax.lax.broadcasted_iota(jnp.int32, (to, wo, co), 1)
        # class A pairs x pair c with dy col c; class P: x pair c's hi
        # half contributed to dy col c+1 -> pair with dy rolled -1;
        # class N: x pair c's lo half -> dy col c-1 -> dy rolled +1
        dy_a = dyv
        dy_p = jnp.where(col == wo - 1, 0.0, pltpu.roll(dyv, wo - 1, 1))
        dy_n = jnp.where(col == 0, 0.0, pltpu.roll(dyv, 1, 1))
        m = to * wo
        dy_all = jnp.concatenate([dy_a, dy_p, dy_n],
                                 axis=-1).reshape(m, 3 * co)

        @pl.when(jnp.logical_and(i == 0, b == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        xpar = xall.reshape(to + 1, 2, wo, lane)
        for kh in range(4):
            slab = xpar[kh // 2:kh // 2 + to, kh % 2].reshape(m, lane)
            part = jax.lax.dot_general(
                slab, dy_all,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (2CI, 3*CO)
            dw_ref[kh] = dw_ref[kh] + part

    dw3 = pl.pallas_call(
        kernel,
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, 1, wo, lane),
                         lambda b, i: (b, jnp.maximum(2 * i * to - 1, 0),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * to, wo, lane), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wo, lane),
                         lambda b, i: (b, jnp.minimum(2 * i * to + 2 * to,
                                                      h - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, to, wo, co), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, lane, 3 * co),
                               lambda b, i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, lane, 3 * co), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ho * wo * co * ci * 16,
            bytes_accessed=(x.size + dy.size) * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x2, x2, x2, dy)

    # unpack (dw3: (kh, v*CI+ci, class*CO+o)): class A rows hold kw=1+v;
    # class P's hi rows hold kw=0; class N's lo rows hold kw=3
    dw = jnp.stack([
        dw3[:, ci:lane, co:2 * co],    # P, hi rows: kw = 0
        dw3[:, 0:ci, 0:co],            # A, lo rows: kw = 1
        dw3[:, ci:lane, 0:co],         # A, hi rows: kw = 2
        dw3[:, 0:ci, 2 * co:3 * co],   # N, lo rows: kw = 3
    ], axis=1)                          # (4, 4, CI, CO)
    return dw.astype(dtype)
