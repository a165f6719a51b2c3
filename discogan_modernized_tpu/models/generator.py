"""Encoder-decoder Generator (ref model.py:72-225), TPU-native.

Encoder: stride-2 k=4 convs halving spatial size with channel doubling
(LeakyReLU(0.2) everywhere, BatchNorm on all but the first), then a 4x4
VALID conv to a 1x1 x 100 latent with BN+LeakyReLU. Decoder mirrors with
transposed convs (BN+ReLU), ending in a convT to 3 channels + Sigmoid,
output in [0,1]. At image_size=512 this is layer-for-layer the reference
architecture; depth is otherwise derived from image_size (models/geometry).

The reference's `extra_layers` ctor flag selects between two functionally
identical branches (SURVEY.md C2) — kept in the public surface upstack but
mapped to this single architecture.

Functional style: params/state are pytrees, `generator_apply` is pure and
returns (output, new_state) so the whole train step jits into one XLA
program. Activations are NHWC; under bf16 policy conv operands are bf16
with f32 accumulation, BN statistics always f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..core.precision import Policy, F32
from ..ops.conv import conv2d, conv_transpose2d, conv_init, conv_transpose_init
from ..ops.batchnorm import batchnorm_init, batchnorm_apply
from ..ops.activations import leaky_relu, relu, sigmoid
from .geometry import encoder_channels, LATENT_CH, KERNEL


def generator_init(key, image_size: int, dtype=jnp.float32):
    """Initialize generator params and BN state pytrees."""
    chans = encoder_channels(image_size)
    keys = jax.random.split(key, 2 * len(chans) + 2)
    ki = iter(range(len(keys)))

    enc_layers = []
    enc_state = []
    in_ch = 3
    for i, out_ch in enumerate(chans):
        layer = {"w": conv_init(keys[next(ki)], in_ch, out_ch, KERNEL, dtype)}
        st = {}
        if i > 0:
            layer["bn"], st = batchnorm_init(out_ch, dtype)
        enc_layers.append(layer)
        enc_state.append(st)
        in_ch = out_ch

    latent_bn, latent_bn_state = batchnorm_init(LATENT_CH, dtype)
    latent = {
        "w": conv_init(keys[next(ki)], chans[-1], LATENT_CH, KERNEL, dtype),
        "bn": latent_bn,
    }

    dec_layers = []
    dec_state = []
    # First decoder layer: VALID convT latent -> widest channels (1 -> 4).
    bn, st = batchnorm_init(chans[-1], dtype)
    dec_layers.append({
        "w": conv_transpose_init(keys[next(ki)], LATENT_CH, chans[-1], KERNEL, dtype),
        "bn": bn,
    })
    dec_state.append(st)
    # Mirror the halving convs: chans[-1] -> ... -> chans[0] -> 3.
    rev = list(reversed(chans))
    for i in range(len(rev)):
        out_ch = rev[i + 1] if i + 1 < len(rev) else 3
        layer = {"w": conv_transpose_init(keys[next(ki)], rev[i], out_ch, KERNEL, dtype)}
        st = {}
        if out_ch != 3:
            layer["bn"], st = batchnorm_init(out_ch, dtype)
        dec_layers.append(layer)
        dec_state.append(st)

    params = {"encoder": enc_layers, "latent": latent, "decoder": dec_layers}
    state = {
        "encoder": enc_state,
        "latent": latent_bn_state,
        "decoder": dec_state,
    }
    return params, state


def generator_apply(params, state, x, *, policy: Policy = F32, training: bool = True,
                    axis_name: str | None = None):
    """Forward pass. x: (N,H,W,3) in [0,1]. Returns (y, new_state)."""
    cd = policy.compute_dtype
    h = x.astype(cd)

    new_enc_state = []
    for i, layer in enumerate(params["encoder"]):
        h = conv2d(h, layer["w"], stride=2, padding=1, policy=policy,
                   training=training)
        # Tag so remat_policy="conv" saves conv outputs and the backward
        # recomputes only the cheap elementwise BN/activation chains
        # instead of re-running every convolution (train/graph.py).
        h = checkpoint_name(h, "conv_out")
        if "bn" in layer:
            h, st = batchnorm_apply(
                layer["bn"], state["encoder"][i], h, training=training, out_dtype=cd, axis_name=axis_name
            )
        else:
            st = state["encoder"][i]
            h = h.astype(cd)
        h = leaky_relu(h, 0.2)
        new_enc_state.append(st)

    from ..ops.sharding import constrain_latent

    h = conv2d(h, params["latent"]["w"], stride=1, padding=0, policy=policy)
    h = checkpoint_name(h, "conv_out")
    h = constrain_latent(h)  # pin 1x1 latents under spatial sharding
    h, latent_state = batchnorm_apply(
        params["latent"]["bn"], state["latent"], h, training=training, out_dtype=cd, axis_name=axis_name
    )
    # Pin the BN output too: LeakyReLU's backward select otherwise gets an
    # H-sharded layout under spatial partitioning (see parallel/gspmd.py).
    h = constrain_latent(h)
    h = constrain_latent(leaky_relu(h, 0.2))
    # Tag the (tiny) 1x1 latent so remat policies can save it and
    # rematerialize the encoder and decoder halves independently
    # (train/graph.py remat_policy="latent"). No-op without a policy.
    h = checkpoint_name(h, "gen_latent")

    new_dec_state = []
    for i, layer in enumerate(params["decoder"]):
        stride = 1 if i == 0 else 2
        padding = 0 if i == 0 else 1
        h = conv_transpose2d(h, layer["w"], stride=stride, padding=padding, policy=policy)
        h = checkpoint_name(h, "conv_out")
        if "bn" in layer:
            h, st = batchnorm_apply(
                layer["bn"], state["decoder"][i], h, training=training, out_dtype=cd, axis_name=axis_name
            )
            h = relu(h)
        else:
            st = state["decoder"][i]
        new_dec_state.append(st)
    y = sigmoid(h.astype(jnp.float32))

    new_state = {
        "encoder": new_enc_state,
        "latent": latent_state,
        "decoder": new_dec_state,
    }
    return y.astype(jnp.float32), new_state
