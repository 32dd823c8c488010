"""Activations.

Replaces /root/reference/purego/tensor/tensor.go:181 (tanh-approx GELU),
mamba2.go:360 (SiLU), mamba2.go:370 (Softplus) and the SwiGLU composition in
transformer.go:50-66. Gate-first SwiGLU ordering is load-bearing — the
reference shipped garbage output when gate/up were swapped
(docs/changes/BUGFIX_SWIGLU.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def softplus(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softplus(x)


def swiglu(gate_up: jnp.ndarray) -> jnp.ndarray:
    """gate_up is [..., 2*I] laid out [gate | up]; returns silu(gate) * up."""
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return jax.nn.silu(gate) * up
