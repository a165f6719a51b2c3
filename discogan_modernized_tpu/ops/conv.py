"""Convolution primitives, NHWC activations / HWIO kernels (TPU-native layout).

The reference delegates these to cuDNN via `nn.Conv2d` / `nn.ConvTranspose2d`
(ref model.py:8-35, :80-211 — all k=4 kernels, stride 2 "halving" convs plus
one stride-1 VALID conv to/from the 1x1 latent). Here they lower to XLA
`conv_general_dilated`, which tiles onto the MXU; operands are cast to the
policy compute dtype (bf16 on TPU) with float32 accumulation.

Initialization reproduces the torch defaults the reference relies on
(it never sets a custom init): `kaiming_uniform_(a=sqrt(5))`, i.e.
U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with torch's fan conventions —
fan_in = in_ch*k*k for Conv2d and (quirk) out_ch*k*k for ConvTranspose2d
(weight.size(1) * receptive_field).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax import lax

# NHWC activations, HWIO kernels.
DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def conv_init(key, in_ch: int, out_ch: int, kernel: int = 4, dtype=jnp.float32):
    """Torch-default uniform init for a bias-free Conv2d, in HWIO layout."""
    fan_in = in_ch * kernel * kernel
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(
        key, (kernel, kernel, in_ch, out_ch), dtype=dtype, minval=-bound, maxval=bound
    )


def conv_transpose_init(key, in_ch: int, out_ch: int, kernel: int = 4, dtype=jnp.float32):
    """Torch-default init for ConvTranspose2d (fan_in = out_ch*k*k quirk), HWIO."""
    fan_in = out_ch * kernel * kernel
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(
        key, (kernel, kernel, in_ch, out_ch), dtype=dtype, minval=-bound, maxval=bound
    )


def _conv_precision(x):
    # f32 operands must not be silently downcast to bf16 passes on TPU
    # (would blow the 1e-3 fidelity gate); bf16 operands use the MXU's
    # native mode, which accumulates in f32 internally.
    return lax.Precision.HIGHEST if x.dtype == jnp.float32 else None


def conv2d(x, w, *, stride: int, padding: int, policy=None, training: bool = True):
    """2D convolution matching torch Conv2d(k,s,p, bias=False) semantics.

    x: (N,H,W,C) activations; w: (kh,kw,I,O) kernel. Output dtype equals
    the (policy-cast) operand dtype so the op stays cleanly differentiable
    under mixed precision.

    NARROW-INPUT k=4/s=2/p=1 convs (the 3-channel encoder boundary layer,
    ref model.py:8) take a custom-VJP path: their input gradient is a
    transposed conv whose 3-lane output hits the same degenerate
    zero-dilated lowering the forward 64->3 convT did (~9x over roofline,
    PERF.md) — so the VJP routes dx through the subpixel decomposition in
    conv_transpose2d instead. Weight grads keep XLA's emitter (contraction
    over batch x space — never degenerate). DISCOGAN_SUBPIXEL=0 disables
    both tricks; DISCOGAN_SUBPIXEL_DX=0 disables just this VJP (A/B knob).
    """
    if policy is not None:
        x = x.astype(policy.compute_dtype)
        w = w.astype(policy.compute_dtype)
    else:
        w = w.astype(x.dtype)
    narrow_stem = (w.shape[0] == 4 and stride == 2 and padding == 1
                   and w.shape[2] <= 16
                   and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
    # "auto" (default): space-to-depth stem for WIDE-SPATIAL thin inputs
    # in TRAINING programs only — +1.7% whole-program at the 512px b32
    # train point (won every interleaved round) but a 13.9% LOSS on the
    # forward-only 512px inference program (2.10 -> 2.39 ms p50,
    # benchmarks/inference_s2d_ab.json, round 5 — the round-4 matrix's
    # "2.078 -> 2.391 ms regression" was exactly this gate firing for
    # inference). Ambiguous at 64px (best-of +2.7% but round-flappy), so
    # the small-geometry stem keeps the subpixel-dx path. "1"/"0" force.
    s2d_env = os.environ.get("DISCOGAN_S2D_STEM", "auto")
    if narrow_stem and (s2d_env == "1"
                        or (s2d_env == "auto" and x.shape[1] >= 256
                            and training)):
        return _conv2d_s2d_stem(x, w)
    if (narrow_stem
            and os.environ.get("DISCOGAN_SUBPIXEL", "1") != "0"
            and os.environ.get("DISCOGAN_SUBPIXEL_DX", "1") != "0"):
        return _conv2d_subpixel_dx(x, w, stride, padding)
    return _plain_conv2d(x, w, stride, padding)


def _conv2d_s2d_stem(x, w):
    """k4/s2/p1 conv with THIN input channels as one k3/s1 conv on the
    space-to-depth(2) transform (DISCOGAN_S2D_STEM=1; round 4).

    Why: the 512px per-layer itemization (step_itemize round 4) put the
    3-channel stem convs (enc0/dis0, ref model.py:8) at 3-4% MFU — the
    emitter pads the 3 input lanes up to a full tile, and the implicit
    GEMM's contraction dim is k*k*3 = 48 of 128. Space-to-depth packs the
    stride-2 structure into channels: cell c holds elements (2c, 2c+1)
    per axis, so out[i] = sum_u w[u] x[2i+u-1] reads only cells
    i-1 (elem 1), i (both), i+1 (elem 0) — a kernel-3 stride-1 SAME conv
    over cells with 4x the input channels (3 -> 12; contraction dim
    9*12 = 108 of 128). The embedded kernel is w's taps scattered over
    the (cell, element) grid with zeros elsewhere: 2.25x the MACs (zeros
    are multiplied), but MACs were 4% utilized — the same trade XLA's own
    resnet space-to-depth conversion makes. Exact to product reordering
    (bf16 conv reduction order is unspecified anyway); gradients flow
    through the kernel embedding (dw) and the s2d reshape (dx)
    automatically. A/B'd on-chip before any default change (PERF.md).
    """
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    # s2d cells: channel index = a*(2*ci) + b*ci + c for element (a, b).
    xs = (x.reshape(n, h // 2, 2, wd // 2, 2, ci)
          .transpose(0, 1, 3, 2, 4, 5)
          .reshape(n, h // 2, wd // 2, 4 * ci))
    # Embed w (4,4,ci,co) into (3,3,2,2,ci,co): k3 tap t, element a maps
    # to original tap u via (t,a): (0,1)->0, (1,0)->1, (1,1)->2, (2,0)->3
    # (per axis); other (t,a) pairs are structural zeros.
    tap = {(0, 1): 0, (1, 0): 1, (1, 1): 2, (2, 0): 3}
    wbig = jnp.zeros((3, 3, 2, 2, ci, co), dtype=w.dtype)
    for (th, a), uh in tap.items():
        for (tw, b), uw in tap.items():
            wbig = wbig.at[th, tw, a, b].set(w[uh, uw])
    wbig = wbig.reshape(3, 3, 4 * ci, co)
    return lax.conv_general_dilated(
        xs, wbig, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=DIMENSION_NUMBERS, precision=_conv_precision(x),
    )


def _plain_conv2d(x, w, stride: int, padding: int):
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=DIMENSION_NUMBERS,
        precision=_conv_precision(x),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _conv2d_subpixel_dx(x, w, stride, padding):
    return _plain_conv2d(x, w, stride, padding)


def _conv2d_subpixel_dx_fwd(x, w, stride, padding):
    return _plain_conv2d(x, w, stride, padding), (x, w)


def _conv2d_subpixel_dx_bwd(stride, padding, res, dy):
    x, w = res
    # dx of conv(x, w) IS torch's ConvTranspose2d(dy, w) with the same
    # (k, s, p) — conv weight (O,I,k,k) read as convT weight (I',O',k,k);
    # in HWIO that is a swap of the last two axes. out_ch = x's channel
    # count <= 16, so conv_transpose2d takes its subpixel path.
    dx = conv_transpose2d(dy, jnp.swapaxes(w, 2, 3), stride=stride,
                          padding=padding)
    _, vjp_w = jax.vjp(lambda w_: _plain_conv2d(x, w_, stride, padding), w)
    dw, = vjp_w(dy)
    return dx.astype(x.dtype), dw


_conv2d_subpixel_dx.defvjp(_conv2d_subpixel_dx_fwd, _conv2d_subpixel_dx_bwd)


def conv_transpose2d(x, w, *, stride: int, padding: int, policy=None):
    """Transposed 2D convolution matching torch ConvTranspose2d(k,s,p, bias=False).

    w is stored HWIO with I = the transposed op's input channels (torch
    convT weight (I,O,k,k) maps to HWIO via transpose(2,3,0,1)).

    The NARROW k=4/s=2/p=1 "doubling" layers (the final convT to 3 RGB
    channels) use a subpixel decomposition instead of the textbook
    zero-dilated convolution: each output-parity class (a,b) of
    y[2i+a, 2j+b] depends on exactly a 2x2 input window through a fixed
    2x2 slice of the kernel, so the whole op is ONE dense k=2/s=1 conv to
    4*O channels followed by a depth-to-space interleave. Interleaved A/B
    on v5e (PERF.md): 2.3x on the 64->3 output layer — whose degenerate
    3-lane output made it the single worst layer at ~9x over roofline —
    but a LOSS on wide layers (the depth-to-space relayout costs an extra
    HBM pass while XLA's dilated emitter handles wide outputs well), so
    it is gated to out_ch <= 16. DISCOGAN_SUBPIXEL=0 disables.
    DISCOGAN_SUBPIXEL_WIDE=1 lifts the out_ch gate (A/B knob: at 512px
    the step is compute-bound, so the relayout HBM pass that made wide
    subpixel lose at 64px may be free there if the dilated emitter pays
    MACs on the zero positions).
    """
    if policy is not None:
        x = x.astype(policy.compute_dtype)
        w = w.astype(policy.compute_dtype)
    else:
        w = w.astype(x.dtype)
    k = w.shape[0]
    # DISCOGAN_SUBPIXEL_WIDE: "1" lifts the out_ch gate everywhere
    # (round-3/4: does not COMPILE at 512px — the deep dense forms blow
    # up, e.g. dec1's 2048->8192-channel k2 — remote HTTP 500 both
    # rounds); "hi" lifts it only for wide-spatial inputs (>= 64px),
    # i.e. exactly the dec5/dec6 boundary layers the round-4 itemization
    # put at 23-36% MFU under the zero-dilated emitter, while the deep
    # layers keep the emitter that works.
    wide_env = os.environ.get("DISCOGAN_SUBPIXEL_WIDE", "0")
    wide_ok = (w.shape[-1] <= 16
               or wide_env == "1"
               or (wide_env == "hi" and x.shape[1] >= 64))
    if (k == 4 and stride == 2 and padding == 1 and wide_ok
            and os.environ.get("DISCOGAN_SUBPIXEL", "1") != "0"):
        return _conv_transpose_subpixel(x, w)
    pad = k - 1 - padding
    w_flipped = w[::-1, ::-1, :, :]
    return lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        lhs_dilation=(stride, stride),
        dimension_numbers=DIMENSION_NUMBERS,
        precision=_conv_precision(x),
    )


def _conv_transpose_subpixel(x, w):
    """convT(k=4, s=2, p=1) as one k=2 VALID conv + depth-to-space.

    Derivation (1D, per axis; wf = spatially flipped kernel, xd = stride-2
    zero-dilated input padded by k-1-p=2): y[m] = sum_t wf[t]*xd[m+t-2]
    with xd nonzero only at even positions. For m=2i+a the parity forces
    t = a (mod 2), leaving exactly two taps:
        y[2i]   = wf[0]*x[i-1] + wf[2]*x[i]
        y[2i+1] = wf[1]*x[i]   + wf[3]*x[i+1]
    i.e. class a reads window (x[i-1+a], x[i+a]) with taps wf[a::2]. Pad x
    by 1 on both sides, run a single VALID k=2 conv whose output channels
    stack the four (a,b) tap-slices, and take class (a,b)'s map shifted by
    (a,b). Exact to reordering of the same products.
    """
    n, h, wd, _ = x.shape
    o = w.shape[-1]
    wf = w[::-1, ::-1, :, :]
    # (2,2,I,4O): class (a,b) occupies output channels [idx*O, (idx+1)*O).
    wbig = jnp.concatenate(
        [wf[a::2, b::2, :, :] for a in (0, 1) for b in (0, 1)], axis=-1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = lax.conv_general_dilated(
        xp, wbig, window_strides=(1, 1), padding="VALID",
        dimension_numbers=DIMENSION_NUMBERS, precision=_conv_precision(x),
    )  # (N, H+1, W+1, 4O)
    # Interleave: y[2i+a, 2j+b] = out[i+a, j+b, class(a,b)].
    classes = [out[:, a:h + a, b:wd + b, i * o:(i + 1) * o]
               for i, (a, b) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1)))]
    z = jnp.stack(classes, axis=3)  # (N, H, W, 4, O)
    z = z.reshape(n, h, wd, 2, 2, o)          # (N,H,W,a,b,O)
    z = z.transpose(0, 1, 3, 2, 4, 5)          # (N,H,a,W,b,O)
    return z.reshape(n, 2 * h, 2 * wd, o)
