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

import math

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


def conv2d(x, w, *, stride: int, padding: int, policy=None):
    """2D convolution matching torch Conv2d(k,s,p, bias=False) semantics.

    x: (N,H,W,C) activations; w: (kh,kw,I,O) kernel. Output dtype equals
    the (policy-cast) operand dtype so the op stays cleanly differentiable
    under mixed precision.
    """
    if policy is not None:
        x = x.astype(policy.compute_dtype)
        w = w.astype(policy.compute_dtype)
    else:
        w = w.astype(x.dtype)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=DIMENSION_NUMBERS,
        precision=_conv_precision(x),
    )


def conv_transpose2d(x, w, *, stride: int, padding: int, policy=None):
    """Transposed 2D convolution matching torch ConvTranspose2d(k,s,p, bias=False).

    Implemented as the standard fractionally-strided convolution: dilate the
    input by `stride`, pad by k-1-p, convolve with the spatially-flipped
    kernel. w is stored HWIO with I = the transposed op's input channels
    (torch convT weight (I,O,k,k) maps to HWIO via transpose(2,3,0,1)).
    """
    if policy is not None:
        x = x.astype(policy.compute_dtype)
        w = w.astype(policy.compute_dtype)
    else:
        w = w.astype(x.dtype)
    k = w.shape[0]
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
