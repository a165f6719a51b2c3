"""Loss math vs torch criteria (ref image_translation.py:136-168, :267-269)."""

import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from discogan_modernized_tpu.ops.losses import (
    bce_loss,
    mse_loss,
    feature_matching_loss,
    gan_losses,
)

rng = np.random.RandomState(0)


def test_bce_matches_torch():
    p = rng.rand(8, 1).astype(np.float32) * 0.98 + 0.01
    t = (rng.rand(8, 1) > 0.5).astype(np.float32)
    ref = nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t)).item()
    ours = float(bce_loss(jnp.asarray(p), jnp.asarray(t)))
    assert abs(ours - ref) < 1e-6


def test_bce_clamps_extremes_like_torch():
    p = np.array([[0.0], [1.0], [0.5]], np.float32)
    t = np.array([[1.0], [0.0], [1.0]], np.float32)
    ref = nn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t)).item()
    ours = float(bce_loss(jnp.asarray(p), jnp.asarray(t)))
    assert abs(ours - ref) < 1e-4


def test_mse_matches_torch():
    a = rng.rand(4, 8, 8, 3).astype(np.float32)
    b = rng.rand(4, 8, 8, 3).astype(np.float32)
    ref = nn.MSELoss()(torch.from_numpy(a), torch.from_numpy(b)).item()
    ours = float(mse_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(ours - ref) < 1e-6


def _torch_fm(real_feats, fake_feats, skip_first=False):
    """Reference get_fm_loss: HingeEmbeddingLoss(l2, ones) == mean(l2)."""
    crit = nn.HingeEmbeddingLoss()
    if skip_first:
        real_feats, fake_feats = real_feats[1:], fake_feats[1:]
    total = 0.0
    for rf, ff in zip(real_feats, fake_feats):
        rf = torch.from_numpy(rf.transpose(0, 3, 1, 2))
        ff = torch.from_numpy(ff.transpose(0, 3, 1, 2))
        l2 = (rf.mean(0) - ff.mean(0)) ** 2
        total += crit(l2, torch.ones(l2.size())).item()
    return total


def test_fm_matches_torch_hinge_reduction():
    real = [rng.rand(4, 8, 8, 16).astype(np.float32) for _ in range(3)]
    fake = [rng.rand(4, 8, 8, 16).astype(np.float32) for _ in range(3)]
    ref = _torch_fm(real, fake)
    ours = float(feature_matching_loss(
        [jnp.asarray(f) for f in real], [jnp.asarray(f) for f in fake]
    ))
    assert abs(ours - ref) < 1e-5


def test_fm_skip_first_matches_angle_pairing_variant():
    real = [rng.rand(4, 8, 8, 16).astype(np.float32) for _ in range(3)]
    fake = [rng.rand(4, 8, 8, 16).astype(np.float32) for _ in range(3)]
    ref = _torch_fm(real, fake, skip_first=True)
    ours = float(feature_matching_loss(
        [jnp.asarray(f) for f in real], [jnp.asarray(f) for f in fake],
        skip_first=True,
    ))
    assert abs(ours - ref) < 1e-5


def test_gan_losses_match_reference_formula():
    """dis = 0.5*(BCE(real,1)+BCE(fake,0)), gen = BCE(fake,1), with the
    (B,1,1,1)->(B,1) reshape of image_translation.py:151-154."""
    real = (rng.rand(6, 1, 1, 1) * 0.9 + 0.05).astype(np.float32)
    fake = (rng.rand(6, 1, 1, 1) * 0.9 + 0.05).astype(np.float32)
    crit = nn.BCELoss()
    tr = torch.from_numpy(real).view(6, -1)
    tf = torch.from_numpy(fake).view(6, -1)
    ref_dis = ((crit(tr, torch.ones(6, 1)) + crit(tf, torch.zeros(6, 1))) * 0.5).item()
    ref_gen = crit(tf, torch.ones(6, 1)).item()
    dis, gen = gan_losses(jnp.asarray(real), jnp.asarray(fake))
    assert abs(float(dis) - ref_dis) < 1e-6
    assert abs(float(gen) - ref_gen) < 1e-6


def test_bce_gradient_matches_torch_at_saturation():
    """Torch BCELoss backward: (p-t)/max(p(1-p), 1e-12)/N. At p==0/1 the
    naive autodiff of the clamped-log forward is NaN (0*inf); the custom
    VJP must stay finite and equal torch's."""
    import jax
    import jax.numpy as jnp

    p = np.array([[0.0], [1.0], [0.5], [1e-20], [0.3]], np.float32)
    t = np.array([[1.0], [0.0], [1.0], [1.0], [0.0]], np.float32)

    tp = torch.from_numpy(p.copy()).requires_grad_(True)
    loss = nn.BCELoss()(tp, torch.from_numpy(t))
    loss.backward()
    ref_grad = tp.grad.numpy()

    grad = jax.grad(lambda x: bce_loss(x, jnp.asarray(t)))(jnp.asarray(p))
    grad = np.asarray(grad)
    assert np.all(np.isfinite(grad))
    np.testing.assert_allclose(grad, ref_grad, rtol=1e-5, atol=1e-6)


def test_gan_loss_gradient_finite_when_discriminator_saturated():
    import jax
    import jax.numpy as jnp

    real = np.full((4, 1, 1, 1), 1.0, np.float32)   # D certain: real=1
    fake = np.full((4, 1, 1, 1), 0.0, np.float32)   # fake=0

    def gen_loss_of(fake):
        _, gen = gan_losses(jnp.asarray(real), fake)
        return gen

    g = np.asarray(jax.grad(gen_loss_of)(jnp.asarray(fake)))
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0  # still provides a training signal
