"""Torch-semantics Adam with L2-into-gradient weight decay.

The reference uses torch.optim.Adam(lr=2e-4, betas=(0.5, 0.999),
weight_decay=1e-5) over chained generator params and chained discriminator
params (ref image_translation.py:271-287). Torch Adam applies weight decay
by adding wd*param to the gradient *before* the moment updates (not the
decoupled AdamW rule), with eps=1e-8 outside the sqrt and bias correction —
reproduced exactly here so loss trajectories are comparable.

Hand-rolled rather than optax to guarantee the exact update order and to
keep the optimizer a plain pytree that jits into the fused train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def adam_init(params):
    zeros = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
    return {
        "m": zeros,
        "v": jax.tree.map(jnp.copy, zeros),
        "step": jnp.zeros((), jnp.int32),
    }


def adam_update(params, grads, opt_state, *, lr, beta1=0.5, beta2=0.999,
                eps=1e-8, weight_decay=0.0):
    """One Adam step. Returns (new_params, new_opt_state)."""
    step = opt_state["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - beta1 ** t
    bc2 = 1.0 - beta2 ** t

    def upd(p, g, m, v):
        g = g.astype(jnp.float32)
        p32 = p.astype(jnp.float32)
        if weight_decay:
            g = g + weight_decay * p32
        m_new = beta1 * m + (1.0 - beta1) * g
        v_new = beta2 * v + (1.0 - beta2) * jnp.square(g)
        m_hat = m_new / bc1
        v_hat = v_new / bc2
        p_new = p32 - lr * m_hat / (jnp.sqrt(v_hat) + eps)
        return p_new.astype(p.dtype), m_new, v_new

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(opt_state["m"])
    flat_v = treedef.flatten_up_to(opt_state["v"])

    new_p, new_m, new_v = [], [], []
    for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v):
        pn, mn, vn = upd(p, g, m, v)
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
