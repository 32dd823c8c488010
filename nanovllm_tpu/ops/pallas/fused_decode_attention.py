"""Fused burst-decode attention over the pregathered context + stash.

On the hoisted (short-context) decode path, XLA runs each layer's
attention as ~a dozen separate ops per step: two batched QK^T dots (pool
context + burst stash), two mask selects, concat, softmax (max, sub, exp,
sum, div), and two PV dots — plus the slice/fusion scheduling overhead
around each. At the r5 256-lane headline shape that op-count tax (not
bandwidth) dominates the non-matmul step time, and for deep thin models
(Mistral's 32 layers, GPT-2's 12) it IS the decode bound
(docs/PERFORMANCE.md r5 zoo anatomy).

This kernel runs the whole thing in ONE pallas_call per (layer, step):

  - grid over lane blocks; per grid step the lane block's context pages
    (the pregather kernel's S-minor [B, Hkv, D, S] output — already the
    layout the score/PV dots want) stream through VMEM double-buffered;
  - batched dot_general over (lane, kv-head): scores [Bb, Hkv, G, S+J]
    in fp32, one masked softmax, two PV dots, all in registers/VMEM;
  - causal/window masks arrive precomputed per STEP ([B, S] / [B, J]
    int8) — layers share them, so the per-layer mask ops disappear.

The stash operand is the bhjd carry slice [B, Hkv, J, D] (see
models/model.create_burst_stash) read directly — no relayout.
Numerics: bf16 operands, fp32 MXU accumulation and softmax — the same
arithmetic the XLA path performs on converted operands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False

_NEG_INF = -1e30


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


def _lane_block(B: int) -> int:
    """Lanes per grid step. The mask blocks' second-minor dim is Bb, so it
    must be a multiple of 8 or B itself (TPU sublane rule); 8 keeps the
    double-buffered K/V context blocks a few MB at typical shapes."""
    return 8 if B % 8 == 0 else B


def fused_supported(
    B: int, H: int, Hkv: int, D: int, S: int, J: int
) -> bool:
    """Shape preconditions; callers fall back to the XLA op chain
    otherwise. Every non-leading block dim is the full array dim, so
    Mosaic's 8/128 divisibility rule doesn't constrain H/Hkv/D directly —
    the requirements are the in-kernel reshape/dot shapes."""
    return (
        D % 8 == 0        # kT/vT block second-minor (also full, belt+braces)
        and S % 128 == 0  # kT/vT block minor (pregather S = nb * 128)
        and J % 8 == 0    # stash block second-minor
        and H % Hkv == 0
        and B >= 1
    )


def _kernel(
    idx_ref,     # [1] scalar prefetch: layer index
    q_ref,       # [Bb, H, D] bf16 (RoPE applied)
    kT_ref,      # [1, Bb, Hkv, D, S] bf16 pregathered context block, S-minor
    vT_ref,      # [1, Bb, Hkv, D, S]
    sk_ref,      # [1, Bb, Hkv, J, D] bhjd stash block
    sv_ref,      # [1, Bb, Hkv, J, D]
    ctxm_ref,    # [Bb, S] f32 additive context bias (0 = valid, -1e30 = masked)
    stashm_ref,  # [Bb, J] f32 additive stash bias
    out_ref,     # [Bb, H, D]
    *,
    scale: float,
):
    del idx_ref
    Bb, H, D = q_ref.shape
    Hkv = kT_ref.shape[2]
    S = kT_ref.shape[4]
    J = sk_ref.shape[3]
    G = H // Hkv
    BH = Bb * Hkv  # Mosaic's tpu.matmul takes at most ONE batch dim

    qg = q_ref[...].reshape(BH, G, D)
    kT = kT_ref[0].reshape(BH, D, S)
    # Batched over folded (lane, kv-head): [BH, G, D] x [BH, D, S].
    s_ctx = jax.lax.dot_general(
        qg, kT, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(Bb, Hkv * G, S) * scale
    s_stash = jax.lax.dot_general(
        qg, sk_ref[0].reshape(BH, J, D), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(Bb, Hkv * G, J) * scale

    # Additive bias masks, per lane, applied in the [Bb, H, *] view (lane
    # dim leading). Bias instead of boolean select: Mosaic can't shape-cast
    # i1 vectors, and exp(-1e30 - m) == 0 makes the post-exp zeroing free.
    s_ctx = s_ctx + ctxm_ref[...][:, None, :]
    s_stash = s_stash + stashm_ref[...][:, None, :]

    m = jnp.maximum(
        jnp.max(s_ctx, axis=-1, keepdims=True),
        jnp.max(s_stash, axis=-1, keepdims=True),
    )
    p_ctx = jnp.exp(s_ctx - m)
    p_st = jnp.exp(s_stash - m)
    l = jnp.sum(p_ctx, axis=-1, keepdims=True) + jnp.sum(p_st, axis=-1, keepdims=True)

    pc = (p_ctx / l).astype(kT.dtype).reshape(BH, G, S)
    ps = (p_st / l).astype(kT.dtype).reshape(BH, G, J)
    # PV: [BH, G, S] x [BH, D, S] (contract S) -> [BH, G, D]
    out = jax.lax.dot_general(
        pc, vT_ref[0].reshape(BH, D, S), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out += jax.lax.dot_general(
        ps, sv_ref[0].reshape(BH, J, D), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[...] = out.reshape(Bb, H, D).astype(out_ref.dtype)


def fused_decode_attention(
    q: jnp.ndarray,        # [B, H, D] (RoPE applied)
    kT_ctx: jnp.ndarray,   # [L, B, Hkv, D, S] pregathered, S-minor (FULL)
    vT_ctx: jnp.ndarray,   # [L, B, Hkv, D, S]
    stash_k: jnp.ndarray,  # [L, B, Hkv, J, D] bhjd carry (FULL)
    stash_v: jnp.ndarray,  # [L, B, Hkv, J, D]
    ctx_mask: jnp.ndarray,    # [B, S] f32 additive bias (0 valid / -1e30 masked)
    stash_mask: jnp.ndarray,  # [B, J] f32 additive bias
    layer,                 # int or traced int32: which layer's blocks to read
    scale: float,
) -> jnp.ndarray:
    """The FULL [L, ...] context/stash buffers are passed and the layer is
    selected by the block index map (scalar-prefetched): an XLA-level
    per-layer slice operand would be MATERIALIZED to feed the custom call
    (measured 1.14 s/2 bursts of slice_bitcast_fusion at the 256-lane
    headline shape — more than the kernel saves); the block DMA reads the
    layer's pages straight out of the big buffers instead."""
    B, H, D = q.shape
    Hkv, S = kT_ctx.shape[2], kT_ctx.shape[4]
    J = stash_k.shape[3]
    Bb = _lane_block(B)
    grid = (B // Bb,)
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)

    def lane(i, idx_ref):
        return (i, 0, 0)

    def lane5(i, idx_ref):
        return (idx_ref[0], i, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bb, H, D), lane),
            pl.BlockSpec((1, Bb, Hkv, D, S), lane5),
            pl.BlockSpec((1, Bb, Hkv, D, S), lane5),
            pl.BlockSpec((1, Bb, Hkv, J, D), lane5),
            pl.BlockSpec((1, Bb, Hkv, J, D), lane5),
            pl.BlockSpec((Bb, S), lambda i, idx_ref: (i, 0)),
            pl.BlockSpec((Bb, J), lambda i, idx_ref: (i, 0)),
        ],
        out_specs=pl.BlockSpec((Bb, H, D), lane),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # The K/V context blocks are the traffic; a raised limit keeps
            # them double-buffered instead of serializing DMA with compute.
            vmem_limit_bytes=64 * (1 << 20),
        ),
        interpret=_INTERPRET,
    )(lidx, q, kT_ctx, vT_ctx, stash_k, stash_v, ctx_mask, stash_mask)
    return out


def decode_masks(
    ctx0: jnp.ndarray,  # [B] int32 context length at burst start
    step_idx,           # scalar int32
    S: int,
    J: int,
    sliding_window: int = 0,
):
    """Per-step (layer-shared) additive bias masks (0 = valid, -1e30 =
    masked) for the fused kernel — semantics identical to
    ops.attention.attention_decode_stashed's masking: pool slots hold
    positions < ctx0-1; stash row j holds position ctx0-1+j."""
    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    ctx_mask = pos < (ctx0[:, None] - 1)
    jj = jnp.arange(J, dtype=jnp.int32)[None, :]
    stash_mask = jj <= step_idx
    if sliding_window > 0:
        q_pos = ctx0[:, None] - 1 + step_idx
        ctx_mask &= pos > q_pos - sliding_window
        stash_mask = stash_mask & (jj > step_idx - sliding_window)
    stash_mask = jnp.broadcast_to(stash_mask, (ctx0.shape[0], J))
    return (
        jnp.where(ctx_mask, 0.0, _NEG_INF).astype(jnp.float32),
        jnp.where(stash_mask, 0.0, _NEG_INF).astype(jnp.float32),
    )
