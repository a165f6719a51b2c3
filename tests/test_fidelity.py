"""Fidelity gate: our JAX models vs the PyTorch reference architecture.

BASELINE.json north star requires generator outputs within 1e-3 of the
reference; in f32 we hold a much tighter bound. Weights flow through the
torch-compat state_dict converters, which simultaneously verifies the
checkpoint naming contract (strict=True load).
"""

import numpy as np
import pytest
import torch

import jax

from discogan_modernized_tpu.models import (
    generator_init,
    generator_apply,
    discriminator_init,
    discriminator_apply,
)
from discogan_modernized_tpu.models.torch_compat import (
    generator_to_state_dict,
    generator_from_state_dict,
    discriminator_to_state_dict,
    discriminator_from_state_dict,
)
from torch_ref import (
    RefGenerator,
    RefDiscriminator,
    nhwc_to_nchw_tensor,
)

torch.manual_seed(0)


def _rand_image(batch, size, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(batch, size, size, 3).astype(np.float32)


@pytest.mark.parametrize("image_size", [32, 64])
def test_generator_forward_matches_torch(image_size):
    params, state = generator_init(jax.random.PRNGKey(42), image_size)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          generator_to_state_dict(params, state).items()}

    ref = RefGenerator(image_size)
    ref.load_state_dict(sd, strict=True)
    ref.train()

    x = _rand_image(4, image_size)
    xt = nhwc_to_nchw_tensor(x)
    with torch.no_grad():
        y_ref = ref(xt).numpy().transpose(0, 2, 3, 1)

    y, _ = generator_apply(params, state, x, training=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-3, rtol=0)
    assert float(np.max(np.abs(np.asarray(y) - y_ref))) < 1e-4


@pytest.mark.parametrize("image_size", [32, 64])
def test_discriminator_forward_matches_torch(image_size):
    params, state = discriminator_init(jax.random.PRNGKey(7), image_size)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          discriminator_to_state_dict(params, state).items()}

    ref = RefDiscriminator(image_size)
    ref.load_state_dict(sd, strict=True)
    ref.train()

    x = _rand_image(4, image_size, seed=1)
    xt = nhwc_to_nchw_tensor(x)
    with torch.no_grad():
        prob_ref, feats_ref = ref(xt)
        prob_ref = prob_ref.numpy()
        feats_ref = [f.numpy().transpose(0, 2, 3, 1) for f in feats_ref]

    (prob, feats), _ = discriminator_apply(params, state, x, training=True)
    np.testing.assert_allclose(
        np.asarray(prob).reshape(-1), prob_ref.reshape(-1), atol=1e-4, rtol=0
    )
    assert len(feats) == len(feats_ref)
    for f, fr in zip(feats, feats_ref):
        np.testing.assert_allclose(np.asarray(f), fr, atol=1e-3, rtol=0)


def test_generator_roundtrip_from_torch_weights():
    """Torch-initialized weights -> our pytree -> identical forward."""
    image_size = 32
    ref = RefGenerator(image_size)
    ref.train()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, state = generator_from_state_dict(sd, image_size)

    x = _rand_image(2, image_size, seed=3)
    with torch.no_grad():
        y_ref = ref(nhwc_to_nchw_tensor(x)).numpy().transpose(0, 2, 3, 1)
    y, _ = generator_apply(params, state, x, training=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=0)


def test_discriminator_roundtrip_from_torch_weights():
    image_size = 32
    ref = RefDiscriminator(image_size)
    ref.train()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, state = discriminator_from_state_dict(sd, image_size)

    x = _rand_image(2, image_size, seed=4)
    with torch.no_grad():
        prob_ref, _ = ref(nhwc_to_nchw_tensor(x))
    (prob, _), _ = discriminator_apply(params, state, x, training=True)
    np.testing.assert_allclose(
        np.asarray(prob).reshape(-1), prob_ref.numpy().reshape(-1), atol=1e-4, rtol=0
    )


def test_bn_running_stats_match_torch():
    """Train-mode forward updates running stats with torch momentum/unbiased-var."""
    image_size = 32
    params, state = generator_init(jax.random.PRNGKey(0), image_size)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          generator_to_state_dict(params, state).items()}
    ref = RefGenerator(image_size)
    ref.load_state_dict(sd, strict=True)
    ref.train()

    x = _rand_image(4, image_size, seed=9)
    with torch.no_grad():
        ref(nhwc_to_nchw_tensor(x))
    _, new_state = generator_apply(params, state, x, training=True)

    sd_after = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ours_after = generator_to_state_dict(params, new_state)
    for k in sd_after:
        if "running_mean" in k or "running_var" in k:
            np.testing.assert_allclose(
                ours_after[k], sd_after[k], atol=1e-5, rtol=1e-5, err_msg=k
            )


def test_eval_mode_uses_running_stats():
    image_size = 32
    params, state = generator_init(jax.random.PRNGKey(5), image_size)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          generator_to_state_dict(params, state).items()}
    ref = RefGenerator(image_size)
    ref.load_state_dict(sd, strict=True)
    ref.eval()

    x = _rand_image(2, image_size, seed=11)
    with torch.no_grad():
        y_ref = ref(nhwc_to_nchw_tensor(x)).numpy().transpose(0, 2, 3, 1)
    y, new_state = generator_apply(params, state, x, training=False)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=0)
    # eval must not mutate state
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(new_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_512_state_dict_names_match_reference_names():
    """At 512px the exported keys must be exactly the reference model.py names."""
    params, state = generator_init(jax.random.PRNGKey(1), 512)
    keys = set(generator_to_state_dict(params, state).keys())
    # Spot-check the exact Sequential indices from ref model.py:147-212.
    for expect in [
        "encoder.0.weight", "encoder.2.weight", "encoder.3.weight",
        "encoder.20.weight", "encoder.21.weight",
        "decoder.0.weight", "decoder.1.weight", "decoder.21.weight",
    ]:
        assert expect in keys, expect
    assert "decoder.22.weight" not in keys

    dparams, dstate = discriminator_init(jax.random.PRNGKey(2), 512)
    dkeys = set(discriminator_to_state_dict(dparams, dstate).keys())
    for expect in ["conv1.weight", "conv8.weight", "bn2.weight", "bn7.running_var"]:
        assert expect in dkeys, expect
    assert "bn1.weight" not in dkeys and "bn8.weight" not in dkeys
