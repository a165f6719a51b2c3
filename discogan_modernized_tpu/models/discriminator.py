"""PatchGAN-to-scalar Discriminator (ref model.py:5-69), TPU-native.

Stride-2 k=4 convs with the generator-encoder trunk (BN+LeakyReLU(0.2) on
all but the first), then a 4x4 VALID conv to 1 channel + Sigmoid giving a
(N,1,1,1) probability. Returns `(prob, features)` where features are the
LeakyReLU outputs of the batch-normed convs — six at 512px, exactly the
list model.py:69 feeds the feature-matching loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..core.precision import Policy, F32
from ..ops.conv import conv2d, conv_init
from ..ops.batchnorm import batchnorm_init, batchnorm_apply
from ..ops.activations import leaky_relu, sigmoid
from .geometry import encoder_channels, KERNEL


def discriminator_init(key, image_size: int, dtype=jnp.float32):
    chans = encoder_channels(image_size)
    keys = jax.random.split(key, len(chans) + 1)

    layers = []
    states = []
    in_ch = 3
    for i, out_ch in enumerate(chans):
        layer = {"w": conv_init(keys[i], in_ch, out_ch, KERNEL, dtype)}
        st = {}
        if i > 0:
            layer["bn"], st = batchnorm_init(out_ch, dtype)
        layers.append(layer)
        states.append(st)
        in_ch = out_ch

    params = {
        "trunk": layers,
        "head": {"w": conv_init(keys[-1], chans[-1], 1, KERNEL, dtype)},
    }
    state = {"trunk": states}
    return params, state


def discriminator_apply(params, state, x, *, policy: Policy = F32, training: bool = True,
                        axis_name: str | None = None):
    """Forward pass. Returns ((prob, features), new_state).

    prob: (N,1,1,1) float32 in NHWC (spatial dims kept to mirror the
    reference's (B,1,1,1) output shape). features: list of NHWC maps.
    """
    cd = policy.compute_dtype
    h = x.astype(cd)

    feats = []
    new_states = []
    for i, layer in enumerate(params["trunk"]):
        h = conv2d(h, layer["w"], stride=2, padding=1, policy=policy,
                   training=training)
        # remat_policy="conv" saves conv outputs; backward recomputes only
        # the elementwise BN/activation chains (train/graph.py).
        h = checkpoint_name(h, "conv_out")
        if "bn" in layer:
            h, st = batchnorm_apply(
                layer["bn"], state["trunk"][i], h, training=training, out_dtype=cd, axis_name=axis_name
            )
        else:
            st = state["trunk"][i]
            h = h.astype(cd)
        h = leaky_relu(h, 0.2)
        if "bn" in layer:
            feats.append(h)
        new_states.append(st)

    from ..ops.sharding import constrain_latent

    logits = conv2d(h, params["head"]["w"], stride=1, padding=0, policy=policy)
    prob = constrain_latent(sigmoid(logits.astype(jnp.float32)))
    return (prob, feats), {"trunk": new_states}


def discriminator_apply_pair(params, state, x_real, x_fake, *,
                             policy: Policy = F32, training: bool = True,
                             axis_name: str | None = None):
    """Both forwards of ONE discriminator — real then fake — with every
    convolution batched over the concatenated inputs (2B effective MXU
    batch; at b64 the per-forward batch leaves the late small-spatial
    layers underfilled, PERF.md batch sweep) while BatchNorm statistics
    stay PER HALF.

    Exactly equivalent to two sequential discriminator_apply calls (ref
    image_translation.py:353-361 order): train-mode BN normalizes each
    half with its own batch statistics, and each layer's running stats
    take the real update then the fake update — the same two updates the
    sequential calls make. The batch dim is parallel (never reduced) in
    convolutions, so per-sample conv math is unchanged.

    Returns ((prob_real, feats_real), (prob_fake, feats_fake), new_state).
    """
    cd = policy.compute_dtype
    n = x_real.shape[0]
    h = jnp.concatenate([x_real, x_fake], axis=0).astype(cd)

    feats_r, feats_f = [], []
    new_states = []
    for i, layer in enumerate(params["trunk"]):
        h = conv2d(h, layer["w"], stride=2, padding=1, policy=policy,
                   training=training)
        h = checkpoint_name(h, "conv_out")
        if "bn" in layer:
            hr, st = batchnorm_apply(
                layer["bn"], state["trunk"][i], h[:n], training=training,
                out_dtype=cd, axis_name=axis_name)
            hf, st = batchnorm_apply(
                layer["bn"], st, h[n:], training=training,
                out_dtype=cd, axis_name=axis_name)
            h = jnp.concatenate([hr, hf], axis=0)
        else:
            st = state["trunk"][i]
            h = h.astype(cd)
        h = leaky_relu(h, 0.2)
        if "bn" in layer:
            feats_r.append(h[:n])
            feats_f.append(h[n:])
        new_states.append(st)

    from ..ops.sharding import constrain_latent

    logits = conv2d(h, params["head"]["w"], stride=1, padding=0, policy=policy)
    prob = constrain_latent(sigmoid(logits.astype(jnp.float32)))
    return ((prob[:n], feats_r), (prob[n:], feats_f), {"trunk": new_states})
