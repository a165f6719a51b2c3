"""Pallas kernel for the boundary convT (the generator head, 64->3).

Ref match: /root/reference/model.py:211 — the final
`ConvTranspose2d(64, 3, 4, 2, 1)` at the 512px geometry README.md:110
requires. The round-4 itemization (PERF.md) made this the single worst
512px offender: 49.4 ms excess of the 255.5 ms G-step (fwd 3768 us, dx
1926, dw 4952 per instance vs ~400-700 us floors; 1-2% MFU).

Round-5 component decomposition (benchmarks/head_parts_ab.json) splits
each mode's cost:
  - the class interleave (subpixel -> NHWC depth-to-space with per-class
    shifts) costs ~1350 us IN EVERY MODE (fwd, and its transpose in both
    dx and dw) — XLA lowers it as several poorly-laid-out 50 MB passes;
  - the k2s1 subpixel conv itself runs 3.5x (fwd) / 5x (dw) above its
    lane-starved MXU floor (~700 us: 12 output lanes of 128 is
    intrinsic; the rest is emitter layout waste).

This kernel attacks both on the FORWARD: one pass that
  - reads input row-tiles through the block pipeline with 1-row clamped
    halo blocks (manual DMA was abandoned: Mosaic requires tile-aligned
    slices on the minor two dims, and the CI=64-lane layout cannot
    satisfy them — errors on record in git history),
  - stacks the two row taps on the contraction dim (K = 2*CI) and runs
    ONE N=8*CO matmul per tile whose lane halves are the two column
    taps; the v0 half's +1 column shift happens on the f32 accumulator
    via pltpu.roll (rolls are 32-bit-only),
  - performs the class interleave IN VMEM via shared rolls + masked
    selects (Mosaic has no sublane<->lane shape casts and rejects
    concat of offset-layout slices), in one of two output layouts
    (see head_convt_fwd).

STATUS (round 5): compiled-correct on the real chip but measured
SLOWER than the XLA subpixel path at the 512px head shape — kmajor
1.08-1.22x, flat6 1.48x — with the full diagnostic decomposition in
PERF.md round 5 (the block pipeline at 64-lane minors and the
lane-padded interleave are the binding terms). Kept tested and
UNROUTED; ops/conv.py does not call it. The `_stop_after` arms are the
measurement diagnostics (benchmarks/head_kernel_ab.py). Correctness:
exact to f32-accumulation reordering vs lax.conv_general_dilated
(tests/test_pallas_head.py, interpret on CPU + compiled via
bench.pallas_selfcheck on the real chip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _granule(dtype) -> int:
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_th(h: int) -> int:
    th = min(32, h)
    while h % th:
        th -= 1
    return th


def head_convt_fwd(x, w, *, layout: str = "kmajor", interpret: bool = False,
                   _stop_after: str | None = None):
    """y = conv_transpose(x, w, k=4, s=2, p=1) for thin out_ch.

    x: (N, H, W, CI) NHWC; w: (4, 4, CI, CO) HWIO (I = convT input
    channels, the ops/conv.py convention). Returns (N, 2H, 2W, CO).

    layout: how the class interleave leaves the kernel (Mosaic cannot
    shape-cast the full (TH, W, 2, CO) -> (TH, 2W*CO) sublane->lane
    merge in one value op, so the last step differs):
      "flat6"  — kernel emits (N, 2H, W, 2*CO); the caller's reshape to
                 (N, 2H, 2W, CO) is a row-major bitcast (free), but the
                 kernel's output block is (..., W, 2*CO)-minor: 2*CO of
                 128 lanes, so the HBM write is narrow-granule.
      "kmajor" — kernel emits (N, 2H, 2*CO, W): full-lane (W-minor)
                 writes; the caller pays one XLA minor-dim transpose
                 (~a 50 MB relayout pass) to reach NHWC.
    Both are measured on-chip (benchmarks/head_kernel_ab.py).
    """
    n, h, wd, ci = x.shape
    assert w.shape[:3] == (4, 4, ci), (x.shape, w.shape)
    co = w.shape[-1]
    dtype = x.dtype
    w = w.astype(dtype)

    th = _pick_th(h)
    nt = h // th
    g = _granule(dtype)
    pw = _round_up(max(wd + 2, g), g)
    lane_ci = 2 * ci

    # Weight layout: taps split by COLUMN parity v, with both ROW taps u
    # stacked on the contraction dim (K = 2*CI):
    #   wA[u*CI+ci, cls*CO+o] = wbig[u, 0, ci, cls*CO+o]  (reads xpad[c])
    #   wB[u*CI+ci, ...]      = wbig[u, 1, ...]           (reads xpad[c+1])
    # The slab holds raw x columns (col c = x col c, so xpad[c+1] =
    # x[c]); the v0 result is rolled +1 column on the f32 accumulator,
    # wrapping the zeroed tail into column 0 = the left pad.
    wf = w[::-1, ::-1, :, :]
    wbig = jnp.stack(  # (2, 2, CI, 4*CO): [u, v] tap for the 4 classes
        [wf[a::2, b::2, :, :] for a in (0, 1) for b in (0, 1)],
        axis=-2).reshape(2, 2, ci, 4 * co)
    wvu = wbig.transpose(1, 0, 2, 3).reshape(2, 2 * ci, 4 * co)
    # one (2*CI, 8*CO) matrix: lanes [0:4CO] = v0 tap, [4CO:8CO] = v1
    wcat = jnp.concatenate([wvu[0], wvu[1]], axis=-1)

    def kernel(lo_ref, xm_ref, hi_ref, w_ref, y_ref):
        i = pl.program_id(1)

        if _stop_after == "read":
            # diagnostic: the block pipeline alone (no assembly/compute)
            s = jnp.max(xm_ref[0].astype(jnp.float32)) * 1e-30
            y_ref[0] = jnp.full(y_ref.shape[1:], s, dtype)
            return

        # Assemble the padded row window as VALUES — the halo rows come
        # in as their own 1-row blocks (clamped index maps; the clamped
        # duplicates at the borders are replaced by the zero pad here).
        zrow = jnp.zeros((1, wd, ci), dtype)
        if _stop_after == "input_nohalo":
            xl, xh = zrow, zrow  # diagnostic: halo blocks unread
        else:
            xl = jnp.where(i == 0, zrow, lo_ref[0])
            xh = jnp.where(i == nt - 1, zrow, hi_ref[0])
        xall = jnp.concatenate([xl, xm_ref[0], xh], axis=0)
        # zero tail columns: wrap source for the left pad + right pad
        xall = jnp.concatenate(
            [xall, jnp.zeros((th + 2, pw - wd, ci), dtype)], axis=1)

        # row taps stacked on lanes: slab[p, c, u*CI+ci] = x[r0-1+p+u, c].
        # The +1 column shift of the v=0 tap happens on the f32 RESULT
        # (pltpu.roll is 32-bit only): acc_v0 is computed against raw x
        # columns and rolled forward one column, wrapping the zeroed tail
        # into column 0 = the left pad.
        m = (th + 1) * pw
        slab = jnp.concatenate([xall[0:th + 1], xall[1:th + 2]],
                               axis=-1).reshape(m, lane_ci)

        if _stop_after in ("input", "input_nohalo"):
            s = jnp.max(slab.astype(jnp.float32)) * 1e-30
            y_ref[0] = jnp.full(y_ref.shape[1:], s, dtype)
            return

        # one matmul, N = 24: lanes [0:12] = v0 tap, [12:24] = v1 tap
        acc_pair = jax.lax.dot_general(
            slab, w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(th + 1, pw, 8 * co)
        acc3 = (pltpu.roll(acc_pair[:, :, 0:4 * co], 1, 1)
                + acc_pair[:, :, 4 * co:8 * co])

        if _stop_after == "matmul":
            # diagnostic: cost of blocks-in + assembly + matmuls + write,
            # WITHOUT the class interleave (reduce keeps acc3 live)
            s = jnp.max(acc3) * 1e-30
            y_ref[0] = jnp.full(y_ref.shape[1:], s, dtype)
            return

        # class interleave: y[2i'+a, 2j+b, o] = acc3[i'+a, j+b, (2a+b)*CO+o]
        # Built from pltpu.roll + masked select so every vector keeps a
        # clean (offset-0) layout — Mosaic cannot concat/cast vectors
        # that carry sublane/lane offsets from misaligned slices. Rolls
        # are shared across the two row parities (3 rolls total).
        troll = pltpu.roll(acc3, pw - 1, 1)     # [., c] = acc3[., c+1]
        l6 = pltpu.roll(acc3, 2 * co, 2)        # lane l = acc3 lane l+2co
        lt6 = pltpu.roll(troll, 2 * co, 2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (th, pw, 4 * co), 2)
        rows = []
        for a in (0, 1):
            r0 = (l6 if a else acc3)[a:th + a]   # major slices: clean
            r1 = (lt6 if a else troll)[a:th + a]
            # lane k = b*CO + o reads r_b lane (2a+b)*CO + o (post-roll)
            q = jnp.where(lane < co, r0, r1)
            ya = q[:, 0:wd, 0:2 * co]
            if layout != "flat6":
                # (TH, 2*CO, W): minor-dim transpose puts W on lanes
                ya = jnp.transpose(ya, (0, 2, 1))
            rows.append(ya)
        # row parity merge is a MAJOR-dim reshape (free)
        z = jnp.stack(rows, axis=1)
        z = z.reshape((2 * th,) + z.shape[2:])
        y_ref[0] = z.astype(dtype)

    flops = 2 * n * h * wd * (4 * co) * (4 * ci)
    if layout == "flat6":
        out_shape = jax.ShapeDtypeStruct((n, 2 * h, wd, 2 * co), dtype)
        out_block = (1, 2 * th, wd, 2 * co)
    else:
        out_shape = jax.ShapeDtypeStruct((n, 2 * h, 2 * co, wd), dtype)
        out_block = (1, 2 * th, 2 * co, wd)
    raw = pl.pallas_call(
        kernel,
        grid=(n, nt),
        in_specs=[
            # 1-row halo blocks with clamped index maps (the kernel
            # substitutes zeros at the borders)
            pl.BlockSpec((1, 1, wd, ci),
                         lambda b, i: (b, jnp.maximum(i * th - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wd, ci), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wd, ci),
                         lambda b, i: (b, jnp.minimum(i * th + th, h - 1),
                                       0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * ci, 8 * co), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(out_block, lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + n * 4 * h * wd * co * x.dtype.itemsize,
            transcendentals=0,
        ),
        # the f32 accumulators carry a 12->128 lane pad, so the stack
        # peaks ~24 MB at TH=32 — above Mosaic's 16 MB default but well
        # inside the v5e's 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, x, x, wcat)
    if layout == "flat6":
        # (W, 2*CO) -> (2W, CO) is a row-major bitcast
        return raw.reshape(n, 2 * h, 2 * wd, co)
    # (2*CO, W) -> (W, 2*CO): one minor-dim relayout, then free merge
    return raw.transpose(0, 1, 3, 2).reshape(n, 2 * h, 2 * wd, co)
