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
matmuls with no dynamic shapes. For LARGE expert counts under expert
parallelism, `moe_forward_dispatch` (ModelConfig.moe_capacity_factor > 0
and T >= moe_dispatch_min_tokens — the measured v5e crossover is T~1024;
below it dense is weight-stream-bound and dispatch's gather/scatter only
adds overhead, tools/ubench_moe.py) provides the capacity-bounded
gather/scatter dispatch: expert-major static
[X, C] batches, compute scaling with T*k instead of T*X, standard
capacity-drop semantics on overflow.

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


def _route(cfg: ModelConfig, p: dict, x: jnp.ndarray):
    from nanovllm_tpu.ops.linear import linear

    logits = linear(p["router"], x).astype(jnp.float32)  # [T, X]
    probs = jax.nn.softmax(logits, axis=-1)
    top_w, top_i = jax.lax.top_k(probs, cfg.num_experts_per_tok)  # [T, k]
    if cfg.moe_router_renormalize:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    return top_w, top_i


def _ew(p: dict, key: str, dtype):
    """Expert weight stack as (stream_array, scale_or_None). Quantized
    experts (io/loader.quantize_params) stream int8 and fold the
    per-(expert, out-channel) scale into the einsum RESULT — XLA fuses the
    int8->bf16 convert into the dot read (measured at parity with the
    Pallas INT8 kernel, tools/ubench_int8_xla.py), so expert bytes halve."""
    w = p[key]
    if isinstance(w, dict):
        return w["qw"].astype(dtype), w["scale"]
    return w.astype(dtype), None


def _expert_glu(cfg: ModelConfig, p: dict, xe: jnp.ndarray) -> jnp.ndarray:
    """Batched GLU over expert-major rows: xe [X, C, E_hid] -> [X, C, E_hid]."""
    gu, gu_s = _ew(p, "gate_up", xe.dtype)
    h = jnp.einsum("xce,xei->xci", xe, gu, preferred_element_type=jnp.float32)
    if gu_s is not None:
        h = h * gu_s[:, None, :]
    h = h.astype(xe.dtype)
    gate, up = jnp.split(h, 2, axis=-1)
    h = jax.nn.silu(gate) * up
    dn, dn_s = _ew(p, "down", xe.dtype)
    y = jnp.einsum("xci,xie->xce", h, dn, preferred_element_type=jnp.float32)
    if dn_s is not None:
        y = y * dn_s[:, None, :]
    return y


def moe_forward_dispatch(
    cfg: ModelConfig, p: dict, x: jnp.ndarray, capacity: int,
    valid_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Capacity-bounded sorted dispatch: gather each expert's (at most
    `capacity`) assigned tokens into an expert-major [X, C, E_hid] batch, run
    the GLU once per expert row, gather results back per (token, k) slot.
    Compute scales with T*k*factor instead of T*X — the EP-scalable path
    (SURVEY §7 hard-part #4). Tokens past an expert's capacity lose that
    expert's contribution; when the router renormalizes, the surviving
    experts' combine weights are renormalized over the survivors so the
    output stays a convex combination (drop degrades gracefully instead of
    shrinking the residual). Measure the drop rate with
    `moe_dispatch_drop_stats` before enabling in serving.
    `valid_mask` [T] excludes padding rows (prefill tail padding / inactive
    decode lanes) from the dispatch so they never consume capacity slots."""
    T, Eh = x.shape
    X, k, C = cfg.num_experts, cfg.num_experts_per_tok, capacity
    top_w, top_i = _route(cfg, p, x)

    e_flat = top_i.reshape(-1)                               # [T*k]
    if valid_mask is not None:
        # Route invalid rows to the out-of-range expert id X: their one-hot
        # row is all zeros (no capacity consumed) and their dispatch slot is
        # the OOB sentinel, so the gather-back yields exactly zero for them.
        e_flat = jnp.where(jnp.repeat(valid_mask, k), e_flat, X)
    tok_flat = jnp.repeat(jnp.arange(T, dtype=jnp.int32), k)
    onehot = jax.nn.one_hot(e_flat, X, dtype=jnp.int32)      # [T*k, X]
    # Exclusive running count of prior assignments to the same expert =
    # this assignment's position within the expert's capacity window.
    pos_in_e = jnp.sum((jnp.cumsum(onehot, axis=0) - onehot) * onehot, axis=1)
    keep = pos_in_e < C
    if cfg.moe_router_renormalize:
        # Renormalize combine weights over the SURVIVING experts (fully
        # dropped tokens stay zero — the residual path carries them).
        w_kept = top_w * keep.reshape(T, k)
        denom = jnp.sum(w_kept, axis=-1, keepdims=True)
        top_w = jnp.where(denom > 0.0, w_kept / jnp.maximum(denom, 1e-9), 0.0)
    w_flat = top_w.reshape(-1)
    slot = jnp.where(keep, e_flat * C + pos_in_e, X * C)     # OOB sentinel

    dispatch = (
        jnp.full((X * C + 1,), T, jnp.int32).at[slot].set(tok_flat, mode="drop")[:-1]
    )
    # Per-slot combine weight (each slot holds at most one assignment).
    w_slot = jnp.zeros((X * C + 1,), jnp.float32).at[slot].set(w_flat, mode="drop")[:-1]
    x_pad = jnp.concatenate([x, jnp.zeros((1, Eh), x.dtype)], axis=0)
    xe = x_pad[dispatch].reshape(X, C, Eh)
    y = _expert_glu(cfg, p, xe)                              # [X, C, Eh] f32

    # Combine by scatter-ADD back to token rows (dispatch row T = sentinel
    # for empty slots). Equivalent to the per-(t,k) gather-back + k-sum, but
    # the k-sum happens in expert-major space, so under expert parallelism
    # GSPMD's cross-device reduction is ONE all-reduce of [T, Eh] (4.2 MB at
    # Granite-MoE-1B T=1024) instead of the [T*k, Eh] gather-back (33.5 MB)
    # — measured on the 8-device mesh (docs/PERFORMANCE.md, EP collectives).
    yw = y.reshape(X * C, Eh) * w_slot[:, None]
    out = jnp.zeros((T + 1, Eh), y.dtype).at[dispatch].add(yw)[:T]
    return out.astype(x.dtype)


def moe_dispatch_drop_stats(
    cfg: ModelConfig, p: dict, x: jnp.ndarray, capacity: int,
) -> dict:
    """Diagnostic: how lossy would capacity-bounded dispatch be on THIS
    input? Returns dropped/total (token, expert) assignments and the routing
    probability mass lost to drops. Run this (tools/ubench_moe.py prints it)
    on real-checkpoint activations before enabling moe_capacity_factor in
    serving — random-weight routing is near-uniform and hides hot experts."""
    T = x.shape[0]
    X, k, C = cfg.num_experts, cfg.num_experts_per_tok, capacity
    top_w, top_i = _route(cfg, p, x)
    e_flat = top_i.reshape(-1)
    onehot = jax.nn.one_hot(e_flat, X, dtype=jnp.int32)
    pos_in_e = jnp.sum((jnp.cumsum(onehot, axis=0) - onehot) * onehot, axis=1)
    keep = pos_in_e < C
    dropped = jnp.sum(~keep)
    lost_mass = jnp.sum(top_w.reshape(-1) * (~keep))
    return {
        "dropped_assignments": int(dropped),
        "total_assignments": T * k,
        "drop_rate": float(dropped) / (T * k),
        "lost_weight_mass": float(lost_mass) / T,
        "capacity": C,
    }


def moe_forward(
    cfg: ModelConfig, p: dict, x: jnp.ndarray,
    valid_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """x [T, E_hid] -> [T, E_hid]. `valid_mask` [T] marks real rows; padding
    rows are excluded from capacity-bounded dispatch (the dense path computes
    them harmlessly — their outputs are discarded downstream)."""
    from nanovllm_tpu.ops.linear import linear

    T = x.shape[0]
    k = cfg.num_experts_per_tok
    if cfg.moe_capacity_factor > 0 and T >= cfg.moe_dispatch_min_tokens:
        import math

        C = math.ceil(T * k / cfg.num_experts * cfg.moe_capacity_factor)
        C = min(max(8 * math.ceil(C / 8), 8), T)  # sublane-pad, never beyond T
        out = moe_forward_dispatch(cfg, p, x, C, valid_mask)
        if "shared" in p:
            from nanovllm_tpu.ops.activations import swiglu

            h = linear(p["shared"]["up"], x)
            out = out + linear(p["shared"]["down"], swiglu(h))
        return out
    top_w, top_i = _route(cfg, p, x)
    combine = jax.nn.one_hot(top_i, cfg.num_experts, dtype=jnp.float32)  # [T, k, X]
    combine = jnp.sum(combine * top_w[..., None], axis=1)  # [T, X]

    # Dense expert compute on the MXU: [T, E] x [X, E, 2I] -> [T, X, 2I]
    gu, gu_s = _ew(p, "gate_up", x.dtype)
    h = jnp.einsum("te,xei->txi", x, gu, preferred_element_type=jnp.float32)
    if gu_s is not None:
        h = h * gu_s[None, :, :]
    h = h.astype(x.dtype)
    gate, up = jnp.split(h, 2, axis=-1)
    h = jax.nn.silu(gate) * up
    dn, dn_s = _ew(p, "down", x.dtype)
    y = jnp.einsum("txi,xie->txe", h, dn, preferred_element_type=jnp.float32)
    if dn_s is not None:
        y = y * dn_s[None, :, :]
    out = jnp.einsum("txe,tx->te", y, combine)
    out = out.astype(x.dtype)

    if "shared" in p:
        # Granite 4.0 shared expert runs unconditionally alongside the routed ones.
        from nanovllm_tpu.ops.activations import swiglu

        h = linear(p["shared"]["up"], x)
        out = out + linear(p["shared"]["down"], swiglu(h))
    return out
