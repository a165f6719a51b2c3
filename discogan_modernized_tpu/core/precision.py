"""Precision policy for TPU execution.

The reference runs everything in float32 on CUDA (PyTorch default). On TPU
the MXU natively consumes bfloat16, so the default training policy keeps
master parameters and batch-norm statistics in float32 while feeding the
convolutions bfloat16 operands with float32 accumulation
(`preferred_element_type=float32`). A pure-f32 policy is used by the
fidelity tests, which gate generator outputs to within 1e-3 of the PyTorch
reference (BASELINE.json north star).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy threaded through ops and models.

    param_dtype:   dtype parameters are stored in (master copy).
    compute_dtype: dtype conv/matmul operands are cast to.
    accum_dtype:   accumulation / normalization statistics dtype.
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    accum_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return jax.tree.map(
            lambda a: a.astype(self.compute_dtype)
            if isinstance(a, jax.Array) or hasattr(a, "astype")
            else a,
            x,
        )


F32 = Policy(jnp.float32, jnp.float32, jnp.float32)
BF16 = Policy(jnp.float32, jnp.bfloat16, jnp.float32)


def default_policy(precision: str | None = None) -> Policy:
    """Resolve a policy name ("bf16" | "f32" | None=auto).

    Auto picks bf16 on TPU backends and f32 elsewhere (CPU tests need f32
    for the 1e-3 fidelity gate).
    """
    if precision == "f32" or precision == "float32":
        return F32
    if precision == "bf16" or precision == "bfloat16":
        return BF16
    if precision is not None:
        # A typo ("fp32", "f64") must not silently fall through to auto —
        # a profile recorded as f32 but measured in bf16 poisons every
        # number derived from it. CLI parsers restrict choices already;
        # this guards library/tool callers.
        raise ValueError(
            f"unknown precision {precision!r} (expected bf16|f32|None)")
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover - no backend at all
        platform = "cpu"
    return BF16 if platform == "tpu" else F32
