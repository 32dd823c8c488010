"""Attention over the paged KV pool — XLA reference implementations.

Replaces the reference's per-head score loops
(/root/reference/purego/tensor/attention.go:354-470 MHA/GQA,
mqa.go:184-243 MQA) with batched grouped-head einsums: a single formulation
covers MHA / GQA / MQA by folding heads into [num_kv_heads, group] — no
materialized repeat-KV (the reference repeats KV heads to full Q-head count,
attention.go:252-255; here the group axis rides the einsum).

Numerics: scores and softmax in float32 (bf16 softmax loses tail mass),
output cast back to the activation dtype. Masks cover causality, context
length (padded pool slots), and an optional sliding window (Mistral — the
capability the reference only name-checks, SURVEY.md §5 "long-context").

The Pallas paged-attention kernel (ops/pallas/paged_attention.py) is the fast
path for decode on TPU; these functions are the semantics-defining fallback
and the prefill path.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _grouped(q: jnp.ndarray, num_kv_heads: int) -> jnp.ndarray:
    """[..., H, D] -> [..., Hkv, G, D]"""
    *lead, H, D = q.shape
    return q.reshape(*lead, num_kv_heads, H // num_kv_heads, D)


def attention_chunk(
    q: jnp.ndarray,  # [T, H, D] — current chunk queries (RoPE already applied)
    k: jnp.ndarray,  # [S, Hkv, D] — full context keys (prefix + chunk)
    v: jnp.ndarray,  # [S, Hkv, D]
    q_positions: jnp.ndarray,  # [T] int32 absolute positions
    k_positions: jnp.ndarray,  # [S] int32 absolute positions (OOB => masked)
    context_len,  # scalar int32: number of valid keys by position
    scale: float,
    sliding_window: int = 0,
) -> jnp.ndarray:
    """Causal attention for one sequence's prefill chunk, supporting a cached
    prefix (chunked prefill: keys include prefix gathered from the pool).
    Returns [T, H, D]."""
    Hkv = k.shape[-2]
    qg = _grouped(q, Hkv).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    scores = jnp.einsum("thgd,shd->hgts", qg, kf) * scale
    mask = k_positions[None, :] <= q_positions[:, None]  # causal
    mask &= (k_positions < context_len)[None, :]
    if sliding_window > 0:
        mask &= k_positions[None, :] > q_positions[:, None] - sliding_window
    scores = jnp.where(mask[None, None, :, :], scores, NEG_INF)
    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum("hgts,shd->thgd", probs, v.astype(jnp.float32))
    T, H = q.shape[0], q.shape[1]
    return out.reshape(T, H, -1).astype(q.dtype)


def attention_chunk_batched(
    q: jnp.ndarray,  # [N, T, H, D]
    k: jnp.ndarray,  # [N, S, Hkv, D]
    v: jnp.ndarray,  # [N, S, Hkv, D]
    q_positions: jnp.ndarray,  # [N, T] int32
    k_positions: jnp.ndarray,  # [S] int32
    context_lens: jnp.ndarray,  # [N] int32
    scale: float,
    sliding_window: int = 0,
) -> jnp.ndarray:
    """Batched prefill attention: N independent sequences, each causal over
    its own gathered context window. Returns [N, T, H, D]."""
    N, T, H, D = q.shape
    Hkv = k.shape[-2]
    qg = q.reshape(N, T, Hkv, H // Hkv, D).astype(jnp.float32)
    scores = jnp.einsum("nthgd,nshd->nhgts", qg, k.astype(jnp.float32)) * scale
    mask = k_positions[None, None, :] <= q_positions[:, :, None]  # [N, T, S]
    mask &= (k_positions[None, None, :] < context_lens[:, None, None])
    if sliding_window > 0:
        mask &= k_positions[None, None, :] > q_positions[:, :, None] - sliding_window
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum("nhgts,nshd->nthgd", probs, v.astype(jnp.float32))
    return out.reshape(N, T, H, D).astype(q.dtype)


def attention_decode_stashed(
    q: jnp.ndarray,        # [B, H, D]
    k_ctx: jnp.ndarray,    # [B, S, Hkv, D] pool context (positions < ctx0-1 valid)
    v_ctx: jnp.ndarray,    # [B, S, Hkv, D]
    stash_k: jnp.ndarray,  # [n_steps, B, Hkv, D] burst K (step j = position ctx0-1+j)
    stash_v: jnp.ndarray,  # [n_steps, B, Hkv, D]
    ctx0: jnp.ndarray,     # [B] int32 context length at burst start (incl. 1st burst token)
    step_idx,              # scalar int32: current burst step i
    scale: float,
    sliding_window: int = 0,
    ctx_layout: str = "bshd",  # "bhds": k/v_ctx are [B, Hkv, D, S] (S minor)
    stash_layout: str = "jbhd",  # "bhjd": stash_k/v are [B, Hkv, n_steps, D]
) -> jnp.ndarray:
    """Decode attention for burst-deferred KV writes: the pool gather holds
    pre-burst context only; the burst's own K/V live in the stash and are
    scored separately, with one softmax over the concatenated scores. Exactly
    equivalent to attention_decode over a pool containing the burst rows —
    but the pool scatter happens ONCE per burst (flush) instead of per step.

    ctx_layout="bhds" consumes the Pallas pregather kernel's transposed
    output directly (physically S-minor — the layout the score/PV dots want,
    saving the full-size layout copies XLA otherwise inserts per burst).
    stash_layout="bhjd" consumes a [B, Hkv, J, D] stash carry — its row-major
    layout has the {J, D} tile minor, which BOTH stash dots read natively;
    the step-major [J, B, Hkv, D] carry made XLA relayout the slice per
    (layer, step) at 128 lanes (~2.0 ms/step at the r5 headline shape).
    Returns [B, H, D]."""
    transposed = ctx_layout == "bhds"
    stash_bhjd = stash_layout == "bhjd"
    B = k_ctx.shape[0]
    S = k_ctx.shape[-1] if transposed else k_ctx.shape[1]
    Hkv = k_ctx.shape[1] if transposed else k_ctx.shape[-2]
    J = stash_k.shape[2] if stash_bhjd else stash_k.shape[0]
    qg = _grouped(q, Hkv).astype(jnp.float32)  # [B, Hkv, G, D]
    if transposed:
        s_ctx = jnp.einsum("bhgd,bhds->bhgs", qg, k_ctx.astype(jnp.float32)) * scale
    else:
        s_ctx = jnp.einsum("bhgd,bshd->bhgs", qg, k_ctx.astype(jnp.float32)) * scale
    if stash_bhjd:
        s_stash = jnp.einsum("bhgd,bhjd->bhgj", qg, stash_k.astype(jnp.float32)) * scale
    else:
        s_stash = jnp.einsum("bhgd,jbhd->bhgj", qg, stash_k.astype(jnp.float32)) * scale

    pos = jnp.arange(S, dtype=jnp.int32)[None, :]  # [1, S]
    ctx_mask = pos < (ctx0[:, None] - 1)           # pool holds positions < ctx0-1
    jj = jnp.arange(J, dtype=jnp.int32)[None, :]
    stash_mask = jj <= step_idx                    # causal within the burst
    if sliding_window > 0:
        q_pos = ctx0[:, None] - 1 + step_idx
        ctx_mask &= pos > q_pos - sliding_window
        stash_mask = stash_mask & (jj > step_idx - sliding_window)
    s_ctx = jnp.where(ctx_mask[:, None, None, :], s_ctx, NEG_INF)
    s_stash = jnp.where(stash_mask[:, None, None, :], s_stash, NEG_INF)

    scores = jnp.concatenate([s_ctx, s_stash], axis=-1)  # [B, Hkv, G, S+J]
    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    if transposed:
        out = jnp.einsum("bhgs,bhds->bhgd", probs[..., :S], v_ctx.astype(jnp.float32))
    else:
        out = jnp.einsum("bhgs,bshd->bhgd", probs[..., :S], v_ctx.astype(jnp.float32))
    if stash_bhjd:
        out += jnp.einsum("bhgj,bhjd->bhgd", probs[..., S:], stash_v.astype(jnp.float32))
    else:
        out += jnp.einsum("bhgj,jbhd->bhgd", probs[..., S:], stash_v.astype(jnp.float32))
    return out.reshape(B, q.shape[1], -1).astype(q.dtype)


def attention_decode(
    q: jnp.ndarray,  # [B, H, D]
    k_ctx: jnp.ndarray,  # [B, S, Hkv, D] gathered from the pool
    v_ctx: jnp.ndarray,  # [B, S, Hkv, D]
    context_lens: jnp.ndarray,  # [B] int32 (number of valid tokens incl. current)
    scale: float,
    sliding_window: int = 0,
) -> jnp.ndarray:
    """Batched single-token decode attention over gathered pages. Key slot s
    holds absolute position s (block tables are gathered in logical order).
    Returns [B, H, D]."""
    B, S = k_ctx.shape[0], k_ctx.shape[1]
    Hkv = k_ctx.shape[-2]
    qg = _grouped(q, Hkv).astype(jnp.float32)  # [B, Hkv, G, D]
    scores = jnp.einsum("bhgd,bshd->bhgs", qg, k_ctx.astype(jnp.float32)) * scale
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]  # [1, S]
    mask = pos < context_lens[:, None]
    if sliding_window > 0:
        mask &= pos > (context_lens[:, None] - 1) - sliding_window
    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum("bhgs,bshd->bhgd", probs, v_ctx.astype(jnp.float32))
    return out.reshape(B, q.shape[1], -1).astype(q.dtype)
