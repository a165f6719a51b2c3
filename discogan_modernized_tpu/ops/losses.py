"""Loss primitives matching the reference loss graph numerics.

- `bce_loss`: torch nn.BCELoss on sigmoid probabilities with mean reduction
  and torch's log clamp at -100 (ref image_translation.py:268, :146-168).
- `mse_loss`: torch nn.MSELoss (ref :267, :349-350).
- `feature_matching_loss`: per discriminator feature, the elementwise squared
  difference of batch-mean activations fed through HingeEmbeddingLoss with
  all-ones targets — which reduces exactly to mean(l2) — summed over
  features (ref get_fm_loss image_translation.py:136-144). `skip_first`
  reproduces angle_pairing.py:114-115 (feats[1:]).
- `gan_losses`: dis = 0.5*(BCE(real,1)+BCE(fake,0)), gen = BCE(fake,1),
  with the (B,1,1,1)->(B,1) reshape of image_translation.py:151-154 applied
  unconditionally (the reshape-free angle_pairing.py:122-138 variant is a
  latent shape bug in the reference — SURVEY.md appendix).

All reductions run in float32 regardless of compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG_CLAMP = -100.0
_BCE_GRAD_EPS = 1e-12  # torch ATen binary_cross_entropy backward epsilon


@jax.custom_vjp
def bce_loss(probs, targets):
    """Binary cross-entropy on probabilities, torch BCELoss semantics.

    Forward clamps each log term at -100 like torch. The backward is a
    custom VJP replicating torch's exactly: (p - t) / max(p*(1-p), 1e-12)
    / N. The naive autodiff of the clamped-log forward produces
    0 * inf = NaN the moment a sigmoid saturates to exactly 0/1 — which a
    512px discriminator does within a few updates — while torch's bounded
    backward (|grad| <= 1e12, then Adam-normalized) trains through it.
    """
    p = probs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    log_p = jnp.maximum(jnp.log(p), _LOG_CLAMP)
    log_1p = jnp.maximum(jnp.log1p(-p), _LOG_CLAMP)
    return -jnp.mean(t * log_p + (1.0 - t) * log_1p)


def _bce_fwd(probs, targets):
    return bce_loss(probs, targets), (probs, targets)


def _bce_bwd(res, g):
    probs, targets = res
    p = probs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    denom = jnp.maximum(p * (1.0 - p), _BCE_GRAD_EPS)
    grad_p = g * (p - t) / denom / p.size
    # Targets are constants in every call site; propagate their true
    # cotangent anyway for generality: dL/dt = -(log p - log(1-p))/N.
    log_p = jnp.maximum(jnp.log(p), _LOG_CLAMP)
    log_1p = jnp.maximum(jnp.log1p(-p), _LOG_CLAMP)
    grad_t = g * -(log_p - log_1p) / p.size
    return grad_p.astype(probs.dtype), grad_t.astype(targets.dtype)


bce_loss.defvjp(_bce_fwd, _bce_bwd)


def mse_loss(pred, target):
    return jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def feature_matching_loss(real_feats, fake_feats, *, skip_first: bool = False,
                          axis_name: str | None = None):
    """Sum over features of mean((mean_N(real) - mean_N(fake))^2).

    axis_name: with cross-replica ("sync") statistics, the batch means are
    taken over the global batch via pmean so data-parallel training is
    step-equal to single-device training on the same global batch.
    """
    from jax import lax

    if skip_first:
        real_feats = real_feats[1:]
        fake_feats = fake_feats[1:]
    total = jnp.float32(0.0)
    for rf, ff in zip(real_feats, fake_feats):
        rm = jnp.mean(rf.astype(jnp.float32), axis=0)
        fm = jnp.mean(ff.astype(jnp.float32), axis=0)
        if axis_name is not None:
            rm = lax.pmean(rm, axis_name)
            fm = lax.pmean(fm, axis_name)
        total = total + jnp.mean(jnp.square(rm - fm))
    return total


def gan_losses(dis_real, dis_fake):
    """(dis_loss, gen_loss) for one discriminator's real/fake probabilities."""
    batch = dis_real.shape[0]
    dis_real = dis_real.reshape(batch, -1)
    dis_fake = dis_fake.reshape(batch, -1)
    ones = jnp.ones_like(dis_real, dtype=jnp.float32)
    zeros = jnp.zeros_like(dis_fake, dtype=jnp.float32)
    dis_loss = (bce_loss(dis_real, ones) + bce_loss(dis_fake, zeros)) * 0.5
    gen_loss = bce_loss(dis_fake, ones)
    return dis_loss, gen_loss
