"""Torch-semantics Adam with L2-into-gradient weight decay.

The reference uses torch.optim.Adam(lr=2e-4, betas=(0.5, 0.999),
weight_decay=1e-5) over chained generator params and chained discriminator
params (ref image_translation.py:271-287). Torch Adam applies weight decay
by adding wd*param to the gradient *before* the moment updates (not the
decoupled AdamW rule), with eps=1e-8 outside the sqrt and bias correction —
reproduced exactly here so loss trajectories are comparable.

Hand-rolled rather than optax to guarantee the exact update order and to
keep the optimizer a plain pytree that jits into the fused train step.

Slim state (TrainConfig.slim_state): at 512px the f32 params + Adam
moments of the four networks are ~8-9 GB — most of a 16 GB v5e chip —
which is what blocks batch 64 and the conv-granularity remat policy
(PERF.md). "mv" stores the Adam moments in bfloat16 (update math stays
f32: moments are cast up, updated, cast back); "all" additionally stores
the master parameters in bfloat16 with STOCHASTIC rounding of the Adam
update — round-to-nearest at bf16's 8-bit mantissa silently drops updates
smaller than ~0.4% of the parameter magnitude and stalls training, while
stochastic rounding is unbiased (E[round(x)] = x) so the parameter still
integrates small updates in expectation. The rounding randomness is a
counter-based derivation from the Adam step number — stateless,
deterministic, resume-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def adam_init(params, mv_dtype=jnp.float32):
    """Adam state over `params`. mv_dtype: storage dtype of the moments
    (bf16 under slim state — see module docstring). Master params are not
    stored here; they live in ts["models"] and init_train_state casts
    them."""
    zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, dtype=mv_dtype), params)
    return {
        "m": zeros,
        "v": jax.tree.map(jnp.copy, zeros),
        "step": jnp.zeros((), jnp.int32),
    }


def _use_rbg_rounding() -> bool:
    """DISCOGAN_SR_RBG=1: draw the stochastic-rounding bits from
    lax.rng_bit_generator (the TPU's hardware-friendly RBG) instead of
    threefry. Motivation (round 4): the 512px slim-all G-step carries a
    12.1 ms optimizer slice vs a ~2.3 ms HBM-bandwidth ideal
    (step_itemize), and threefry's ~50 ALU ops/word over ~160M params is
    the prime suspect. Unbiasedness only needs uniform low-16 bits, which
    RBG provides; the seed derives from (Adam step, leaf index) exactly
    like the threefry path, so updates stay deterministic and
    resume-safe per backend. Default off until A/B'd on-chip (PERF.md).
    Read at trace time (baked into the cached jitted step programs)."""
    import os

    return os.environ.get("DISCOGAN_SR_RBG") == "1"


def _stochastic_round_bf16(x32, key):
    """Unbiased f32 -> bf16 rounding: add uniform random bits below the
    bf16 mantissa cutoff, then truncate. The carry into the exponent when
    the mantissa overflows is exactly round-up to the next representable
    value, so the scheme is correct across exponent boundaries."""
    bits = lax.bitcast_convert_type(x32.astype(jnp.float32), jnp.uint32)
    if _use_rbg_rounding():
        kd = (key if getattr(key, "dtype", None) == jnp.uint32
              else jax.random.key_data(key))
        kd = kd.astype(jnp.uint32).reshape(-1)[:2]
        seed = jnp.concatenate([kd, kd])  # uint32[4] RBG state
        _, rnd = lax.rng_bit_generator(seed, x32.shape, dtype=jnp.uint32)
        rnd = rnd & jnp.uint32(0xFFFF)
    else:
        rnd = jax.random.bits(key, x32.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    bits = (bits + rnd) & jnp.uint32(0xFFFF0000)
    return lax.bitcast_convert_type(bits, jnp.float32).astype(jnp.bfloat16)


def adam_update(params, grads, opt_state, *, lr, beta1=0.5, beta2=0.999,
                eps=1e-8, weight_decay=0.0, stochastic_round=None):
    """One Adam step. Returns (new_params, new_opt_state).

    Moment storage dtype follows opt_state (adam_init's mv_dtype); the
    update math is always f32. stochastic_round=None (default) derives
    from the PARAMS THEMSELVES: bf16-stored parameters are written back
    with unbiased stochastic rounding (round-to-nearest at bf16 precision
    drops sub-0.4%-of-magnitude updates and stalls training — module
    docstring). Deriving from the state dtype rather than a config/env
    flag makes the written state the single source of truth: an env var
    mutated between init_train_state and trace time cannot silently pair
    bf16 params with RTN writes."""
    if stochastic_round is None:
        stochastic_round = any(
            getattr(p, "dtype", None) == jnp.bfloat16
            for p in jax.tree.leaves(params))
    step = opt_state["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - beta1 ** t
    bc2 = 1.0 - beta2 ** t
    base_key = (jax.random.fold_in(jax.random.PRNGKey(0x5EED), step)
                if stochastic_round else None)

    def upd(p, g, m, v, key):
        g = g.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        if weight_decay:
            g = g + weight_decay * p32
        m_new = beta1 * m.astype(jnp.float32) + (1.0 - beta1) * g
        v_new = beta2 * v.astype(jnp.float32) + (1.0 - beta2) * jnp.square(g)
        m_hat = m_new / bc1
        v_hat = v_new / bc2
        p_new = p32 - lr * m_hat / (jnp.sqrt(v_hat) + eps)
        if key is not None and p.dtype == jnp.bfloat16:
            p_out = _stochastic_round_bf16(p_new, key)
        else:
            p_out = p_new.astype(p.dtype)
        return p_out, m_new.astype(m.dtype), v_new.astype(v.dtype)

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(opt_state["m"])
    flat_v = treedef.flatten_up_to(opt_state["v"])

    new_p, new_m, new_v = [], [], []
    for i, (p, g, m, v) in enumerate(zip(flat_p, flat_g, flat_m, flat_v)):
        key = (jax.random.fold_in(base_key, i)
               if base_key is not None else None)
        pn, mn, vn = upd(p, g, m, v, key)
        new_p.append(pn)
        new_m.append(mn)
        new_v.append(vn)

    return (
        jax.tree.unflatten(treedef, new_p),
        {
            "m": jax.tree.unflatten(treedef, new_m),
            "v": jax.tree.unflatten(treedef, new_v),
            "step": step,
        },
    )
