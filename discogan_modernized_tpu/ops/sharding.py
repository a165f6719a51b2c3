"""Activation-sharding hook for GSPMD modes.

Under spatial (height) sharding the generator's 1x1 latent and the
discriminator's 1x1 head have nothing left to shard spatially; without
guidance XLA's partitioner flip-flops their layout between producers and
consumers and falls back to "involuntary full rematerialization"
(replicate-then-repartition) on the backward selects. The GSPMD wrappers
(parallel/gspmd.py) install a constraint via this contextvar while
TRACING their step bodies; the models call `constrain_latent` on those
tiny activations, pinning them to a batch-only sharding. Outside GSPMD
tracing the hook is a no-op, so the single-device/shard_map paths are
untouched.
"""

from __future__ import annotations

import contextvars

_constraint = contextvars.ContextVar("discogan_activation_constraint",
                                     default=None)


def set_latent_constraint(fn):
    """Install fn(x) -> x for latent activations; returns a reset token."""
    return _constraint.set(fn)


def reset_latent_constraint(token):
    _constraint.reset(token)


def constrain_latent(x):
    """Apply the installed constraint to the FORWARD value only.

    with_sharding_constraint's autodiff rule re-applies the constraint to
    the cotangent; on the degenerate 1x1 latents that forces the SPMD
    partitioner into a backward resharding it handles badly (measured
    gradient corruption up to 0.2 when the cotangent was pinned to a
    replicated layout on the 8-device CPU mesh). A custom_vjp that passes
    the cotangent through untouched keeps gradients bit-equal to the
    unconstrained program while still pinning the forward layout.
    """
    fn = _constraint.get()
    if fn is None:
        return x
    import jax

    @jax.custom_vjp
    def fwd_only(x):
        return fn(x)

    def fwd(x):
        return fn(x), None

    def bwd(_, g):
        return (g,)

    fwd_only.defvjp(fwd, bwd)
    return fwd_only(x)
