"""Elementwise activations (VPU ops; XLA fuses them into conv epilogues).

Matches the reference's LeakyReLU(0.2) encoder / ReLU decoder / Sigmoid
output choices (ref model.py:9-36, :116-143).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def leaky_relu(x, negative_slope: float = 0.2):
    return jnp.where(x >= 0, x, x * negative_slope)


def relu(x):
    return jnp.maximum(x, 0)


def sigmoid(x):
    return jax.nn.sigmoid(x)
