"""Normalization layers.

Replaces the reference's unified LayerNorm/RMSNorm loop
(/root/reference/purego/tensor/tensor.go:193-250 — bias==nil selects RMSNorm).
TPU-first: statistics computed in float32 regardless of activation dtype
(bf16 mean/variance accumulation loses precision), result cast back; XLA fuses
the whole thing into neighboring ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * scale.astype(jnp.float32)
    return y.astype(x.dtype)


def apply_norm(p: dict, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Dispatch on the param dict: presence of 'bias' selects LayerNorm
    (same convention the reference uses, tensor.go:193)."""
    if p.get("bias") is not None:
        return layer_norm(x, p["scale"], p["bias"], eps)
    return rms_norm(x, p["scale"], eps)
