"""Conversion between our param/state pytrees and reference torch state_dicts.

The reference checkpoints raw `state_dict()`s per model as .pth files
(ref image_translation.py:419-432) and inference hardcodes their names
(ref inference.py:127-132). To let users move between frameworks, these
helpers map our pytrees to/from dicts keyed exactly like the reference
modules:

- Discriminator attributes: conv1..convN.weight, bn2..bn{N-1}.{weight,bias,
  running_mean,running_var,num_batches_tracked} (ref model.py:5-36).
- Generator nn.Sequential indices: encoder.[0]=conv, [1]=LeakyReLU, then
  (conv,bn,lrelu) groups; decoder (convT,bn,relu) groups then convT+Sigmoid
  (ref model.py:79-212). Index arithmetic below reproduces that layout for
  any image size (at 512 it is byte-identical naming).

Weight layouts: torch Conv2d (O,I,kh,kw) <-> our HWIO (kh,kw,I,O);
torch ConvTranspose2d (I,O,kh,kw) <-> HWIO via the self-inverse
transpose (2,3,0,1). Everything is numpy here so core stays torch-free;
the checkpoint module handles actual .pth IO.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _np(x):
    return np.asarray(x, dtype=np.float32)


def _conv_to_torch(w):
    return _np(w).transpose(3, 2, 0, 1)


def _conv_from_torch(w):
    return jnp.asarray(np.asarray(w, np.float32).transpose(2, 3, 1, 0))


def _convT_to_torch(w):
    return _np(w).transpose(2, 3, 0, 1)


def _convT_from_torch(w):
    return jnp.asarray(np.asarray(w, np.float32).transpose(2, 3, 0, 1))


def _bn_to_sd(sd, prefix, bn_params, bn_state):
    sd[f"{prefix}.weight"] = _np(bn_params["scale"])
    sd[f"{prefix}.bias"] = _np(bn_params["bias"])
    sd[f"{prefix}.running_mean"] = _np(bn_state["mean"])
    sd[f"{prefix}.running_var"] = _np(bn_state["var"])
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(
        int(bn_state["count"]), dtype=np.int64
    )


def _bn_from_sd(sd, prefix):
    params = {
        "scale": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32)),
        "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32)),
    }
    state = {
        "mean": jnp.asarray(np.asarray(sd[f"{prefix}.running_mean"], np.float32)),
        "var": jnp.asarray(np.asarray(sd[f"{prefix}.running_var"], np.float32)),
        "count": jnp.asarray(
            int(np.asarray(sd[f"{prefix}.num_batches_tracked"]).ravel()[0])
            if f"{prefix}.num_batches_tracked" in sd else 0,
            jnp.int32,
        ),
    }
    return params, state


# --- Generator ------------------------------------------------------------

def _enc_conv_index(i: int) -> int:
    # encoder Sequential: [conv, lrelu] then (conv, bn, lrelu) groups.
    return 0 if i == 0 else 2 + 3 * (i - 1)


def _enc_bn_index(i: int) -> int:
    return 3 + 3 * (i - 1)


def generator_to_state_dict(params, state) -> dict:
    sd: dict = {}
    enc = params["encoder"]
    for i, layer in enumerate(enc):
        sd[f"encoder.{_enc_conv_index(i)}.weight"] = _conv_to_torch(layer["w"])
        if "bn" in layer:
            _bn_to_sd(sd, f"encoder.{_enc_bn_index(i)}", layer["bn"], state["encoder"][i])
    # latent conv continues the (conv, bn, lrelu) pattern.
    li = len(enc)
    sd[f"encoder.{_enc_conv_index(li)}.weight"] = _conv_to_torch(params["latent"]["w"])
    _bn_to_sd(sd, f"encoder.{_enc_bn_index(li)}", params["latent"]["bn"], state["latent"])

    dec = params["decoder"]
    n = len(dec)  # n = H + 1 convTs; last has no BN.
    for j, layer in enumerate(dec):
        sd[f"decoder.{3 * j}.weight"] = _convT_to_torch(layer["w"])
        if "bn" in layer:
            _bn_to_sd(sd, f"decoder.{3 * j + 1}", layer["bn"], state["decoder"][j])
    return sd


def generator_from_state_dict(sd, image_size: int):
    from .generator import generator_init
    import jax

    params, state = generator_init(jax.random.PRNGKey(0), image_size)
    enc = params["encoder"]
    for i, layer in enumerate(enc):
        layer["w"] = _conv_from_torch(sd[f"encoder.{_enc_conv_index(i)}.weight"])
        if "bn" in layer:
            layer["bn"], state["encoder"][i] = _bn_from_sd(sd, f"encoder.{_enc_bn_index(i)}")
    li = len(enc)
    params["latent"]["w"] = _conv_from_torch(sd[f"encoder.{_enc_conv_index(li)}.weight"])
    params["latent"]["bn"], state["latent"] = _bn_from_sd(sd, f"encoder.{_enc_bn_index(li)}")

    for j, layer in enumerate(params["decoder"]):
        layer["w"] = _convT_from_torch(sd[f"decoder.{3 * j}.weight"])
        if "bn" in layer:
            layer["bn"], state["decoder"][j] = _bn_from_sd(sd, f"decoder.{3 * j + 1}")
    return params, state


# --- Discriminator --------------------------------------------------------

def discriminator_to_state_dict(params, state) -> dict:
    sd: dict = {}
    trunk = params["trunk"]
    for i, layer in enumerate(trunk):
        sd[f"conv{i + 1}.weight"] = _conv_to_torch(layer["w"])
        if "bn" in layer:
            _bn_to_sd(sd, f"bn{i + 1}", layer["bn"], state["trunk"][i])
    sd[f"conv{len(trunk) + 1}.weight"] = _conv_to_torch(params["head"]["w"])
    return sd


def discriminator_from_state_dict(sd, image_size: int):
    from .discriminator import discriminator_init
    import jax

    params, state = discriminator_init(jax.random.PRNGKey(0), image_size)
    trunk = params["trunk"]
    for i, layer in enumerate(trunk):
        layer["w"] = _conv_from_torch(sd[f"conv{i + 1}.weight"])
        if "bn" in layer:
            layer["bn"], state["trunk"][i] = _bn_from_sd(sd, f"bn{i + 1}")
    params["head"]["w"] = _conv_from_torch(sd[f"conv{len(trunk) + 1}.weight"])
    return params, state
