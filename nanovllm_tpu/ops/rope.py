"""Rotary position embeddings (HF "rotate_half" convention).

Replaces /root/reference/purego/tensor/rope.go — the reference precomputes a
[max_seq, head_dim] cos/sin table with half-dim frequencies duplicated into
both halves (rope.go:31-47) and PANICS past MaxSeqLen (rope.go:84-86). Here
the tables are computed from the position ids on the fly inside jit (cheap VPU
work XLA fuses into the attention prologue), so there is no context ceiling,
and Llama-3 frequency scaling + partial rotary dims (Falcon/GPT-NeoX style)
are supported — capabilities the reference's docs list as missing
(docs/ARCHITECTURE_GUIDE.md:1120-1126).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.config import RopeScalingConfig


def compute_inv_freq(rotary_dim: int, theta: float, scaling: RopeScalingConfig | None) -> np.ndarray:
    """Host-side (numpy) inverse frequencies [rotary_dim/2], fp32."""
    inv_freq = 1.0 / (theta ** (np.arange(0, rotary_dim, 2, dtype=np.float64) / rotary_dim))
    if scaling is not None and scaling.rope_type == "llama3":
        low_wavelen = scaling.original_max_position_embeddings / scaling.low_freq_factor
        high_wavelen = scaling.original_max_position_embeddings / scaling.high_freq_factor
        wavelen = 2 * math.pi / inv_freq
        # Piecewise: scale low frequencies by 1/factor, keep high frequencies,
        # smooth interpolation in between (Llama-3.1 rope scaling).
        smooth = (scaling.original_max_position_embeddings / wavelen - scaling.low_freq_factor) / (
            scaling.high_freq_factor - scaling.low_freq_factor
        )
        smoothed = (1 - smooth) * inv_freq / scaling.factor + smooth * inv_freq
        inv_freq = np.where(
            wavelen > low_wavelen,
            inv_freq / scaling.factor,
            np.where(wavelen < high_wavelen, inv_freq, smoothed),
        )
    return inv_freq.astype(np.float32)


def rope_cos_sin(positions: jnp.ndarray, inv_freq: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """positions [...,] int32 -> cos/sin [..., rotary_dim] fp32 with the
    half-dim frequencies duplicated into both halves (HF convention)."""
    angles = positions.astype(jnp.float32)[..., None] * inv_freq[None, :]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    return jnp.concatenate([cos, cos], axis=-1), jnp.concatenate([sin, sin], axis=-1)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [..., n_heads, head_dim]; cos/sin: [..., rotary_dim] broadcast over
    the heads axis. Rotates the first rotary_dim dims, passes the rest
    through (partial rotary)."""
    rotary_dim = cos.shape[-1]
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    x_rot = x[..., :rotary_dim].astype(jnp.float32)
    rotated = x_rot * cos + _rotate_half(x_rot) * sin
    rotated = rotated.astype(x.dtype)
    if rotary_dim == x.shape[-1]:
        return rotated
    return jnp.concatenate([rotated, x[..., rotary_dim:]], axis=-1)
