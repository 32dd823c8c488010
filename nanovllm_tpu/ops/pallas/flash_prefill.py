"""Flash prefill attention over the paged KV pool.

The missing sibling of the decode kernel (paged_attention.py): prefill in the
XLA path gathers the ENTIRE padded context window into a dense [N, T, S]
tensor per layer and materializes full [T, S] score matrices
(ops/attention.py attention_chunk / attention_chunk_batched) — the same
3x-traffic pattern the decode kernel's docstring criticizes, and at long
context the score matrix alone is O(T*S) HBM. This kernel never materializes
either: it tiles queries, walks each sequence's block table with
double-buffered page DMAs (prefix pages from cache hits and freshly-written
chunk pages are the same thing — the pool is the single source of truth),
and flash-accumulates per page with an online softmax. Traffic = exactly the
live KV bytes per query tile; causality prunes pages above the tile's last
query row.

Reference behavior being replaced at TPU scale: the reference materializes
full scores too (/root/reference/purego/tensor/attention.go:358) — it has no
long-context story at all (SURVEY.md §5).

Layout notes (TPU tiling; same constraints as the decode kernel):
  - pool rows are [slots, Hkv*D]; per-head column slices are not lane-aligned
    for D < 128. Decode solves this with a block-diagonal Q (fine there —
    decode is memory-bound, the Hkv-fold MXU waste is free). Prefill is
    COMPUTE-bound, so instead the kernel loops heads (python-unrolled, Hkv is
    static) and takes the per-head column slice of the DMA'd page in VMEM —
    the relayout cost is O(page bytes), amortized over O(TQ * G * bs) MXU
    work per page.
  - queries are pre-arranged [N, Hkv, T*G, D] so each head's tile is a
    sublane-aligned row slice.
  - INT8 pools: per-(token, head) K scales fold into score columns and V
    scales into the PV probabilities, exactly as the decode kernel (no
    dequantized page ever materializes).

Ragged lengths ride scalar prefetch: per-sequence block tables, q_start (the
first query row's absolute position = num_cached_tokens for prefix-cache
hits) and context_len drive the page-range computation per (sequence, tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)
_INTERPRET = False


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


def _pick_tq(T: int, G: int) -> int:
    """Query rows per tile: target ~512 (t, g)-rows per head, multiple of 8,
    dividing T (T is a power-of-two bucket)."""
    tq = 512 // max(G, 1)
    tq = max(8, min(128, tq))
    while T % tq:
        tq //= 2
    return max(tq, 1) if T % 8 == 0 else T


def _kernel(
    # scalar prefetch
    bt_ref,       # [N, nb] int32 block tables (layer-rebased)
    start_ref,    # [N] int32 absolute position of q row 0
    ctx_ref,      # [N] int32 context length (prefix + valid chunk)
    # inputs
    q_ref,        # [1, Hkv, TQ*G, D] this (sequence, tile)'s queries
    kpool_ref,    # [slots, Hkv*D] in ANY (bf16/f32 or int8)
    vpool_ref,
    *refs,
    bs: int,
    nb: int,
    TQ: int,
    G: int,
    Hkv: int,
    D: int,
    scale: float,
    window: int,
    quantized: bool,
):
    if quantized:
        (kspool_ref, vspool_ref, o_ref,
         kbuf, vbuf, ksbuf, vsbuf, acc, m_i, l_i, sems) = refs
    else:
        (o_ref, kbuf, vbuf, acc, m_i, l_i, sems) = refs
    n = pl.program_id(0)
    tile = pl.program_id(1)
    ctx = ctx_ref[n]
    q0 = start_ref[n] + tile * TQ           # abs position of this tile's row 0
    # Keys needed: pos in [max(0, q0 - window + 1), min(ctx, q0 + TQ)).
    last_needed = jnp.minimum(ctx, q0 + TQ)
    n_pages = pl.cdiv(last_needed, bs)
    first_page = 0
    if window > 0:
        first_page = jnp.maximum(q0 - window + 1, 0) // bs

    def dmas(slot, j):
        page = bt_ref[n, j]
        out = [
            pltpu.make_async_copy(
                kpool_ref.at[pl.ds(page * bs, bs), :], kbuf.at[slot], sems.at[slot, 0]
            ),
            pltpu.make_async_copy(
                vpool_ref.at[pl.ds(page * bs, bs), :], vbuf.at[slot], sems.at[slot, 1]
            ),
        ]
        if quantized:
            out.append(
                pltpu.make_async_copy(
                    kspool_ref.at[:, pl.ds(page * bs, bs)], ksbuf.at[slot], sems.at[slot, 2]
                )
            )
            out.append(
                pltpu.make_async_copy(
                    vspool_ref.at[:, pl.ds(page * bs, bs)], vsbuf.at[slot], sems.at[slot, 3]
                )
            )
        return out

    acc[...] = jnp.zeros_like(acc)
    m_i[...] = jnp.full_like(m_i, NEG_INF)
    l_i[...] = jnp.zeros_like(l_i)

    @pl.when(first_page < n_pages)
    def _():
        for d in dmas(first_page % 2, first_page):
            d.start()

    TQG = TQ * G
    # Absolute q position per (t, g) row: q0 + row // G.
    q_pos = q0 + jax.lax.broadcasted_iota(jnp.int32, (TQG, 1), 0) // G

    def body(j, _):
        @pl.when((j >= first_page) & (j < n_pages))
        def _():
            slot = j % 2

            @pl.when(j + 1 < n_pages)
            def _():
                for d in dmas((j + 1) % 2, j + 1):
                    d.start()

            for d in dmas(slot, j):
                d.wait()

            k_pos = j * bs + jax.lax.broadcasted_iota(jnp.int32, (1, bs), 1)
            mask = (k_pos <= q_pos) & (k_pos < ctx)
            if window > 0:
                mask &= k_pos > q_pos - window

            for h in range(Hkv):
                q_h = q_ref[0, h].astype(jnp.float32)              # [TQG, D]
                k_h = kbuf[slot][:, h * D:(h + 1) * D].astype(jnp.float32)  # [bs, D]
                v_h = vbuf[slot][:, h * D:(h + 1) * D].astype(jnp.float32)
                s = jax.lax.dot_general(
                    q_h, k_h, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale                                          # [TQG, bs]
                if quantized:
                    s = s * ksbuf[slot][h:h + 1, :]
                s = jnp.where(mask, s, NEG_INF)

                m_prev = m_i[h, :, :1]
                m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.exp(s - m_new)
                l_i[h] = jnp.broadcast_to(
                    alpha * l_i[h, :, :1] + jnp.sum(p, axis=1, keepdims=True),
                    l_i.shape[1:],
                )
                if quantized:
                    p = p * vsbuf[slot][h:h + 1, :]
                acc[h] = acc[h] * alpha + jax.lax.dot_general(
                    p, v_h, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m_i[h] = jnp.broadcast_to(m_new, m_i.shape[1:])

        return None

    jax.lax.fori_loop(0, nb, body, None)
    for h in range(Hkv):
        denom = jnp.maximum(l_i[h, :, :1], 1e-30)
        o_ref[0, h] = (acc[h] / denom).astype(o_ref.dtype)


def flash_prefill_paged(
    q: jnp.ndarray,             # [N, T, H, D] chunk queries (RoPE applied)
    k_pool_l: jnp.ndarray,      # [slots, Hkv*D] (bf16/f32 or int8)
    v_pool_l: jnp.ndarray,
    block_tables: jnp.ndarray,  # [N, nb] int32, layer-rebased
    q_starts: jnp.ndarray,      # [N] int32 abs position of each row-0 query
    context_lens: jnp.ndarray,  # [N] int32
    num_kv_heads: int,
    block_size: int,
    scale: float,
    sliding_window: int = 0,
    k_scale_l: jnp.ndarray | None = None,  # [Hkv, slots] f32 (INT8 pools)
    v_scale_l: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Returns [N, T, H, D] in q.dtype. The pool must already contain the
    chunk's own K/V (prefill writes before attending); the causal mask
    handles the rest. Padded query rows (>= valid length) produce garbage
    the caller discards."""
    N, T, H, D = q.shape
    Hkv = num_kv_heads
    G = H // Hkv
    nb = block_tables.shape[1]
    TQ = _pick_tq(T, G)
    quantized = k_scale_l is not None

    # [N, T, Hkv, G, D] -> [N, Hkv, T, G, D] -> [N, Hkv, T*G, D]
    qx = q.reshape(N, T, Hkv, G, D).transpose(0, 2, 1, 3, 4).reshape(N, Hkv, T * G, D)

    TQG = TQ * G
    in_specs = [
        pl.BlockSpec(
            (1, Hkv, TQG, D), lambda n, t, *_: (n, 0, t, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [block_tables, q_starts, context_lens, qx, k_pool_l, v_pool_l]
    scratch = [
        pltpu.VMEM((2, block_size, Hkv * D), k_pool_l.dtype),
        pltpu.VMEM((2, block_size, Hkv * D), v_pool_l.dtype),
    ]
    if quantized:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY), pl.BlockSpec(memory_space=pl.ANY)]
        operands += [k_scale_l, v_scale_l]
        scratch += [
            pltpu.VMEM((2, Hkv, block_size), jnp.float32),
            pltpu.VMEM((2, Hkv, block_size), jnp.float32),
        ]
    scratch += [
        pltpu.VMEM((Hkv, TQG, D), jnp.float32),    # acc
        pltpu.VMEM((Hkv, TQG, 128), jnp.float32),  # m
        pltpu.VMEM((Hkv, TQG, 128), jnp.float32),  # l
        pltpu.SemaphoreType.DMA((2, 4 if quantized else 2)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N, T // TQ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, Hkv, TQG, D), lambda n, t, *_: (n, 0, t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, bs=block_size, nb=nb, TQ=TQ, G=G, Hkv=Hkv, D=D,
            scale=scale, window=sliding_window, quantized=quantized,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, Hkv, T * G, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(*operands)
    # [N, Hkv, T*G, D] -> [N, T, H, D]
    o = out.reshape(N, Hkv, T, G, D).transpose(0, 2, 1, 3, 4).reshape(N, T, H, D)
    return o.astype(q.dtype)
