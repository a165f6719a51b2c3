"""Primitive-op numerics vs torch functional ops."""

import numpy as np
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from discogan_modernized_tpu.ops.conv import conv2d, conv_transpose2d
from discogan_modernized_tpu.ops.batchnorm import batchnorm_init, batchnorm_apply
from discogan_modernized_tpu.models.geometry import encoder_channels, num_features

rng = np.random.RandomState(1)


def test_conv2d_matches_torch():
    x = rng.rand(2, 16, 16, 5).astype(np.float32)
    w = rng.randn(4, 4, 5, 7).astype(np.float32) * 0.1
    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=1))
    ref = TF.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w.transpose(3, 2, 0, 1)),
        stride=2,
        padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_conv_transpose2d_matches_torch_s2p1():
    x = rng.rand(2, 8, 8, 6).astype(np.float32)
    w = rng.randn(4, 4, 6, 5).astype(np.float32) * 0.1  # HWIO, I=in of transposed op
    ours = np.asarray(
        conv_transpose2d(jnp.asarray(x), jnp.asarray(w), stride=2, padding=1)
    )
    # torch convT weight layout (I, O, kh, kw)
    wt = torch.from_numpy(w.transpose(2, 3, 0, 1))
    ref = TF.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), wt, stride=2, padding=1
    ).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == ref.shape == (2, 16, 16, 5)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_conv_transpose2d_wide_subpixel_matches_torch(monkeypatch):
    """DISCOGAN_SUBPIXEL_WIDE=1 lifts the out_ch<=16 gate: a WIDE k4s2p1
    convT must still be exact through the subpixel decomposition, forward
    and both grads (the 512px compute-bound A/B knob, ops/conv.py)."""
    import jax

    monkeypatch.setenv("DISCOGAN_SUBPIXEL_WIDE", "1")
    x = rng.rand(2, 8, 8, 24).astype(np.float32)
    w = rng.randn(4, 4, 24, 32).astype(np.float32) * 0.1
    f = lambda x, w: conv_transpose2d(x, w, stride=2, padding=1)
    ours = np.asarray(f(jnp.asarray(x), jnp.asarray(w)))
    wt = torch.from_numpy(w.transpose(2, 3, 0, 1))
    ref = TF.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), wt, stride=2, padding=1
    ).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == ref.shape == (2, 16, 16, 32)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)

    dy = rng.randn(*ref.shape).astype(np.float32)
    loss = lambda x, w: jnp.sum(f(x, w) * jnp.asarray(dy))
    dx, dw = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
    wt = wt.detach().requires_grad_(True)
    out = TF.conv_transpose2d(xt, wt, stride=2, padding=1)
    out.backward(torch.from_numpy(dy.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(dx),
                               xt.grad.numpy().transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dw),
                               wt.grad.numpy().transpose(2, 3, 0, 1),
                               atol=2e-4, rtol=1e-4)


def test_conv_transpose2d_matches_torch_valid_latent():
    """The 1->4 latent expansion: ConvTranspose2d(k=4, s=1, p=0)."""
    x = rng.rand(3, 1, 1, 10).astype(np.float32)
    w = rng.randn(4, 4, 10, 8).astype(np.float32) * 0.1
    ours = np.asarray(
        conv_transpose2d(jnp.asarray(x), jnp.asarray(w), stride=1, padding=0)
    )
    wt = torch.from_numpy(w.transpose(2, 3, 0, 1))
    ref = TF.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), wt, stride=1, padding=0
    ).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == ref.shape == (3, 4, 4, 8)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_batchnorm_train_and_eval_match_torch():
    c = 6
    x = rng.randn(4, 5, 5, c).astype(np.float32)
    params, state = batchnorm_init(c)
    params = dict(params)
    params["scale"] = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    params["bias"] = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)

    bn = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(np.asarray(params["scale"])))
        bn.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))
    bn.train()
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        y_ref = bn(xt).numpy().transpose(0, 2, 3, 1)

    y, new_state = batchnorm_apply(params, state, jnp.asarray(x), training=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_state["mean"]), bn.running_mean.numpy(), atol=1e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state["var"]), bn.running_var.numpy(), atol=1e-6, rtol=1e-5
    )

    bn.eval()
    with torch.no_grad():
        y_ref_eval = bn(xt).numpy().transpose(0, 2, 3, 1)
    y_eval, _ = batchnorm_apply(params, new_state, jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(y_eval), y_ref_eval, atol=1e-5, rtol=1e-4)


def test_geometry_schedule():
    assert encoder_channels(512) == [64, 128, 256, 512, 1024, 2048, 2048]
    assert encoder_channels(64) == [64, 128, 256, 512]
    assert num_features(512) == 6  # model.py:69 returns six feature maps
    assert num_features(64) == 3


def test_conv_init_matches_torch_default_distribution():
    """Torch Conv2d default init is kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)); ConvTranspose2d's fan uses
    weight.size(1) (the out-channel dim) — the known torch quirk."""
    import jax
    import math
    from discogan_modernized_tpu.ops.conv import conv_init, conv_transpose_init

    w = np.asarray(conv_init(jax.random.PRNGKey(0), 64, 128, 4))
    bound = 1.0 / math.sqrt(64 * 16)
    assert np.abs(w).max() <= bound
    assert np.abs(w).max() > bound * 0.99   # actually fills the range
    assert abs(np.std(w) - bound / math.sqrt(3)) < bound * 0.02  # uniform std

    wt = np.asarray(conv_transpose_init(jax.random.PRNGKey(1), 64, 128, 4))
    bound_t = 1.0 / math.sqrt(128 * 16)     # fan from OUT channels
    assert np.abs(wt).max() <= bound_t
    assert np.abs(wt).max() > bound_t * 0.99

    # Cross-check against torch's actual default init bounds.
    conv = torch.nn.Conv2d(64, 128, 4, bias=False)
    assert abs(float(conv.weight.abs().max()) - bound) < bound * 0.02
    convt = torch.nn.ConvTranspose2d(64, 128, 4, bias=False)
    assert abs(float(convt.weight.abs().max()) - bound_t) < bound_t * 0.02


def test_conv2d_narrow_input_custom_vjp_grads_match_torch():
    """The 3-channel boundary conv's input grad is routed through the
    subpixel convT decomposition (ops/conv.py custom VJP); both grads
    must still match torch autograd to f32 rounding."""
    import jax

    rng = np.random.RandomState(7)
    x = rng.randn(4, 16, 16, 3).astype(np.float32)
    w = rng.randn(4, 4, 3, 8).astype(np.float32)
    dy = rng.randn(4, 8, 8, 8).astype(np.float32)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1)).requires_grad_(True)
    yt = TF.conv2d(xt, wt, stride=2, padding=1)
    yt.backward(torch.from_numpy(dy.transpose(0, 3, 1, 2)))

    def f(xj, wj):
        y = conv2d(xj, wj, stride=2, padding=1)
        return jnp.sum(y * jnp.asarray(dy))

    gx, gw = jax.grad(f, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(gx), xt.grad.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gw), wt.grad.numpy().transpose(2, 3, 1, 0),
        rtol=1e-4, atol=1e-4)


def test_discriminator_pair_matches_sequential():
    """discriminator_apply_pair (conv-batched real+fake with per-half BN)
    must reproduce two sequential forwards to f32 rounding: probs, features,
    and the real-then-fake running-stat updates."""
    import jax

    from discogan_modernized_tpu.core.precision import F32
    from discogan_modernized_tpu.models.discriminator import (
        discriminator_init, discriminator_apply, discriminator_apply_pair)

    rng = np.random.RandomState(3)
    p, s = discriminator_init(jax.random.PRNGKey(1), 32)
    xr = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    xf = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)

    (pr, fr), s1 = discriminator_apply(p, s, xr, policy=F32)
    (pf, ff), s2 = discriminator_apply(p, s1, xf, policy=F32)
    (Pr, Fr), (Pf, Ff), sp = discriminator_apply_pair(p, s, xr, xf, policy=F32)

    # Equal to f32 rounding: the batched conv may tile/reassociate
    # differently than the per-forward convs on a given backend.
    tol = dict(rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pr), np.asarray(Pr), **tol)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(Pf), **tol)
    for a, b in zip(fr + ff, Fr + Ff):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)
    for a, b in zip(jax.tree.leaves(s2), jax.tree.leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **tol)
