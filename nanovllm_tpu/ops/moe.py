"""Mixture-of-Experts (Granite 3.0 style: top-k routed GLU experts).

Replaces /root/reference/purego/tensor/moe.go — router matmul + softmax
(:63-66), per-token top-k with renormalized weights (:74-103), per-expert GLU
FFN over expert-major 3-D weights (:167-226), optional shared expert
(:131-164).

TPU-first formulation: routing probabilities are computed in fp32; the top-k
weights are scattered back to a dense [T, num_experts] combine matrix and the
expert FFNs run as dense einsums over the stacked expert weights
([E, hidden, 2*inner] / [E, inner, hidden]) — every token visits every expert
on the MXU and the combine matrix zeroes the non-selected ones. That is
exact (identical to sort-based dispatch) and compiles to three big batched
matmuls with no dynamic shapes; a capacity-based sorted dispatch is the
planned optimization for large expert counts under expert parallelism.

Note softmax-then-top-k-then-renormalize (the reference's order) is
mathematically identical to top-k-on-logits-then-softmax (HF GraniteMoe's
order) — softmax is monotonic and both renormalize over the same k entries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nanovllm_tpu.config import ModelConfig


def init_moe_params(cfg: ModelConfig, rng) -> dict:
    E, I, X = cfg.hidden_size, cfg.moe_intermediate_size, cfg.num_experts
    import numpy as np

    return {
        "router": {"w": (rng.standard_normal((E, X)) * 0.02).astype(np.float32)},
        "gate_up": (rng.standard_normal((X, E, 2 * I)) * 0.02).astype(np.float32),
        "down": (rng.standard_normal((X, I, E)) * 0.02).astype(np.float32),
    }


def moe_forward(cfg: ModelConfig, p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """x [T, E_hid] -> [T, E_hid]."""
    from nanovllm_tpu.ops.linear import linear

    T = x.shape[0]
    logits = linear(p["router"], x).astype(jnp.float32)  # [T, X]
    probs = jax.nn.softmax(logits, axis=-1)
    k = cfg.num_experts_per_tok
    top_w, top_i = jax.lax.top_k(probs, k)  # [T, k]
    if cfg.moe_router_renormalize:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    combine = jax.nn.one_hot(top_i, cfg.num_experts, dtype=jnp.float32)  # [T, k, X]
    combine = jnp.sum(combine * top_w[..., None], axis=1)  # [T, X]

    # Dense expert compute on the MXU: [T, E] x [X, E, 2I] -> [T, X, 2I]
    h = jnp.einsum("te,xei->txi", x, p["gate_up"].astype(x.dtype), preferred_element_type=jnp.float32)
    h = h.astype(x.dtype)
    gate, up = jnp.split(h, 2, axis=-1)
    h = jax.nn.silu(gate) * up
    y = jnp.einsum("txi,xie->txe", h, p["down"].astype(x.dtype), preferred_element_type=jnp.float32)
    out = jnp.einsum("txe,tx->te", y, combine)
    out = out.astype(x.dtype)

    if "shared" in p:
        # Granite 4.0 shared expert runs unconditionally alongside the routed ones.
        from nanovllm_tpu.ops.activations import swiglu

        h = linear(p["shared"]["up"], x)
        out = out + linear(p["shared"]["down"], swiglu(h))
    return out
