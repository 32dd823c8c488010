"""Paged decode attention Pallas kernel.

The hot kernel of memory-bound decode (SURVEY.md §7 'Hard parts #1'). The XLA
fallback in ops/attention.py gathers every lane's bucketed context window into
a dense [B, S, Hkv, D] tensor per layer — pool-read + gather-write +
attention-read (3x traffic) over the padded bucket. This kernel walks each
sequence's block table and DMAs only its ceil(ctx/block_size) valid pages
HBM→VMEM (double-buffered), flash-accumulating over pages: traffic = exactly
the live KV bytes, once.

Design note (TPU tiling): pool rows are [slots, Hkv*D] and per-head column
slices are not lane-aligned for D < 128, so the kernel is gridded per BATCH
LANE and processes ALL KV heads of a page with a single MXU dot against a
block-diagonal query matrix

    Q_full [Hkv*Gp, Hkv*D],  Q_full[h*Gp:(h+1)*Gp, h*D:(h+1)*D] = q_h

— the zero blocks kill cross-head terms in Q_full @ page^T, and the
head-diagonal of the [Hkv*Gp, Hkv*D] output block-matrix is extracted
outside the kernel with an einsum. Page DMAs are always full rows (aligned),
and scores/outputs for every head come from one dot pair per page.

Block tables + context lengths ride scalar prefetch
(pltpu.PrefetchScalarGridSpec) so DMA indices are known up front; sliding
windows skip pages wholly outside the window.
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


def _kernel(
    # scalar prefetch
    bt_ref,      # [B, nb] int32 block tables
    ctx_ref,     # [B] int32 valid POOL positions per lane
    step_ref,    # [1] int32 burst step (0 when not stashed)
    # inputs (quantized variant appends kscale/vscale pools [Hkv, slots] f32;
    # stashed variant appends stash_k/stash_v as lane-major [B, J, Hkv*D]
    # VMEM blocks — the wrapper transposes the step-major carry slice, a
    # ~100 KB copy per call; an in-kernel DMA of the strided [J, HD] lane
    # slice is NOT expressible: Mosaic requires second-minor slice sizes to
    # be sublane multiples, and the lane slice is 1 wide)
    q_ref,       # [1, Hkv*Gp, Hkv*D] block-diagonal queries for this lane
    kpool_ref,   # [slots, Hkv*D] in ANY/HBM (bf16/f32 or int8)
    vpool_ref,
    *refs,
    bs: int,
    nb: int,
    Gp: int,
    scale: float,
    window: int,
    quantized: bool,
    npg: int,    # pages fetched + scored per loop iteration
    has_stash: bool = False,
):
    refs = list(refs)
    if quantized:
        kspool_ref, vspool_ref = refs.pop(0), refs.pop(0)
    if has_stash:
        stash_k_ref, stash_v_ref = refs.pop(0), refs.pop(0)
    (o_ref, kbuf, vbuf, *rest) = refs
    if quantized:
        ksbuf, vsbuf = rest.pop(0), rest.pop(0)
    acc, m_i, l_i, sems = rest
    b = pl.program_id(0)
    ctx = ctx_ref[b]
    step = step_ref[0]
    # Query position: the current token (ctx-1) in the plain path; with a
    # stash the pool holds ctx = ctx0-1 pre-burst positions and the query
    # sits at position ctx + step (its K/V live in the stash, row `step`).
    q_pos = ctx + step if has_stash else ctx - 1
    n_pages = pl.cdiv(ctx, bs)
    n_chunks = pl.cdiv(n_pages, npg)
    first_chunk = jnp.int32(0)
    if window > 0:
        first_chunk = (jnp.maximum(q_pos + 1 - window, 0) // bs) // npg

    def dmas(slot, jc):
        """Fetch the npg pages of chunk jc into buffer `slot`. Page indices
        past n_pages clamp to the last valid page (their keys are masked by
        pos >= ctx) — branch-free tail handling."""
        out = []
        for i in range(npg):
            page = bt_ref[b, jnp.minimum(jc * npg + i, jnp.maximum(n_pages - 1, 0))]
            out.append(pltpu.make_async_copy(
                kpool_ref.at[pl.ds(page * bs, bs), :],
                kbuf.at[slot, pl.ds(i * bs, bs), :], sems.at[slot, i, 0],
            ))
            out.append(pltpu.make_async_copy(
                vpool_ref.at[pl.ds(page * bs, bs), :],
                vbuf.at[slot, pl.ds(i * bs, bs), :], sems.at[slot, i, 1],
            ))
            if quantized:
                out.append(pltpu.make_async_copy(
                    kspool_ref.at[:, pl.ds(page * bs, bs)],
                    ksbuf.at[slot, :, pl.ds(i * bs, bs)], sems.at[slot, i, 2],
                ))
                out.append(pltpu.make_async_copy(
                    vspool_ref.at[:, pl.ds(page * bs, bs)],
                    vsbuf.at[slot, :, pl.ds(i * bs, bs)], sems.at[slot, i, 3],
                ))
        return out

    acc[...] = jnp.zeros_like(acc)
    m_i[...] = jnp.full_like(m_i, NEG_INF)
    l_i[...] = jnp.zeros_like(l_i)


    @pl.when(first_chunk < n_chunks)
    def _():
        for d in dmas(first_chunk % 2, first_chunk):
            d.start()

    q = q_ref[0].astype(jnp.float32)  # [Hkv*Gp, Hkv*D] block-diagonal

    def body(jc, _):
        @pl.when((jc >= first_chunk) & (jc < n_chunks))
        def _():
            slot = jc % 2

            @pl.when(jc + 1 < n_chunks)
            def _():
                for d in dmas((jc + 1) % 2, jc + 1):
                    d.start()

            for d in dmas(slot, jc):
                d.wait()
            k = kbuf[slot].astype(jnp.float32)  # [npg*bs, Hkv*D]
            v = vbuf[slot].astype(jnp.float32)

            # All heads at once: zero blocks in q suppress cross-head terms.
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # [Hkv*Gp, npg*bs]
            if quantized:
                # Fold per-(token, head) K scales into the score rows: row
                # block h scales by kscale[h, t] (repeat rows Gp times).
                s = s * pltpu.repeat(ksbuf[slot], Gp, axis=0)
            pos = jc * (npg * bs) + jax.lax.broadcasted_iota(
                jnp.int32, (1, npg * bs), 1
            )
            mask = pos < ctx
            if window > 0:
                mask = mask & (pos > q_pos - window)
            s = jnp.where(mask, s, NEG_INF)

            m_prev = m_i[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new)
            l_i[...] = jnp.broadcast_to(
                alpha * l_i[:, :1] + jnp.sum(p, axis=1, keepdims=True), l_i.shape
            )
            if quantized:
                # Fold V scales into the probabilities used for the PV dot
                # (the normalizer keeps the unscaled p — exact).
                p_v = p * pltpu.repeat(vsbuf[slot], Gp, axis=0)
            else:
                p_v = p
            acc[...] = acc[...] * alpha + jax.lax.dot_general(
                p_v, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            m_i[...] = jnp.broadcast_to(m_new, m_i.shape)

        return None

    jax.lax.fori_loop(0, pl.cdiv(nb, npg), body, None)

    if has_stash:
        # Score the burst stash (this lane's in-flight K/V, unquantized) as
        # one more flash block: stash row j holds position ctx + j, causal
        # within the burst (j <= step).
        sk = stash_k_ref[0].astype(jnp.float32)  # [J, Hkv*D]
        sv = stash_v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            q_ref[0].astype(jnp.float32), sk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [Hkv*Gp, J]
        jj = jax.lax.broadcasted_iota(jnp.int32, (1, sk.shape[0]), 1)
        smask = jj <= step
        if window > 0:
            smask = smask & (ctx + jj > q_pos - window)
        s = jnp.where(smask, s, NEG_INF)
        m_prev = m_i[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_i[...] = jnp.broadcast_to(
            alpha * l_i[:, :1] + jnp.sum(p, axis=1, keepdims=True), l_i.shape
        )
        acc[...] = acc[...] * alpha + jax.lax.dot_general(
            p, sv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_i[...] = jnp.broadcast_to(m_new, m_i.shape)

    denom = jnp.maximum(l_i[:, :1], 1e-30)
    o_ref[0] = (acc[...] / denom).astype(o_ref.dtype)


def paged_attention_decode(
    q: jnp.ndarray,           # [B, H, D]
    k_pool_l: jnp.ndarray,    # [slots, Hkv*D] (bf16/f32 or int8)
    v_pool_l: jnp.ndarray,
    block_tables: jnp.ndarray,  # [B, nb] int32
    context_lens: jnp.ndarray,  # [B] int32
    num_kv_heads: int,
    block_size: int,
    scale: float,
    sliding_window: int = 0,
    k_scale_l: jnp.ndarray | None = None,  # [Hkv, slots] f32 (INT8 pools)
    v_scale_l: jnp.ndarray | None = None,
    pages_per_iter: int = 0,  # 0 = auto (min(4, nb))
    stash_k: jnp.ndarray | None = None,  # [J, B, Hkv*D] burst K (deferred writes)
    stash_v: jnp.ndarray | None = None,
    step_idx=None,  # scalar int32 burst step (required with a stash)
) -> jnp.ndarray:
    """Returns [B, H, D] in q.dtype. Pass k/v scale pools for INT8 KV — the
    kernel folds K scales into scores and V scales into the PV probabilities
    (exact, no dequantized KV ever materializes).

    stash_k/stash_v/step_idx: burst-deferred KV writes (VERDICT r4 #4) — the
    pool holds only pre-burst context (context_lens = ctx0 - 1 valid rows)
    and the in-flight burst's K/V ride a [J, B, Hkv*D] stash scored as one
    extra flash block (row j = position ctx + j, causal j <= step_idx).
    Numerics oracle: ops.attention.attention_decode_stashed.

    pages_per_iter batches several page DMAs per flash iteration: at long
    context x many lanes the kernel's cost is per-iteration DMA-wait
    overhead (B x n_pages x layers small transfers), not HBM bandwidth —
    batching amortizes the waits npg-fold and widens each score dot from
    [.., bs] to [.., npg*bs]. Tail pages clamp to the last valid page and
    mask out (< +npg-1 pages of dead traffic per lane)."""
    B, H, D = q.shape
    Hkv = num_kv_heads
    G = H // Hkv
    nb = block_tables.shape[1]
    Gp = max(8, ((G + 7) // 8) * 8)  # sublane-align the group rows
    quantized = k_scale_l is not None
    import os

    npg = pages_per_iter or int(os.environ.get("NANOVLLM_PAGED_NPG", "0"))
    if not npg:
        # Auto default min(4, nb), shape-aware: the double-buffered K/V (and
        # scale) scratch grows linearly with npg, so large block_size/head
        # configs that fit at npg=1 must not fail to compile (or spill) at 4.
        # Shrink until the total scratch estimate fits a conservative VMEM
        # budget; npg=1 is the pre-batching kernel and always allowed.
        VMEM_BUDGET = 12 << 20
        fixed = (Hkv * Gp) * (Hkv * D) * 4 * 2      # acc + out block (f32)
        fixed += 2 * (Hkv * Gp) * 128 * 4            # m_i + l_i
        fixed += (Hkv * Gp) * (Hkv * D) * q.dtype.itemsize  # q block
        per_page = 2 * 2 * block_size * Hkv * D * k_pool_l.dtype.itemsize
        if quantized:
            per_page += 2 * 2 * Hkv * block_size * 4
        npg = min(4, nb)
        while npg > 1 and fixed + npg * per_page > VMEM_BUDGET:
            npg -= 1
    npg = min(npg, nb)
    has_stash = stash_k is not None

    # Build block-diagonal queries [B, Hkv*Gp, Hkv*D].
    qg = q.reshape(B, Hkv, G, D)
    if Gp != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    eye = jnp.eye(Hkv, dtype=q.dtype)
    # g-major row order (row r = g*Hkv + h): the quantized variant folds
    # per-head scale rows via pltpu.repeat, which TILES [h0..h{Hkv-1}] Gp
    # times — exactly the g-major pattern.
    qfull = jnp.einsum("bhgd,hk->bghkd", qg, eye).reshape(B, Gp * Hkv, Hkv * D)

    if step_idx is None:
        step_arr = jnp.zeros((1,), jnp.int32)
    else:
        step_arr = jnp.reshape(step_idx, (1,)).astype(jnp.int32)
    in_specs = [
        pl.BlockSpec((1, Hkv * Gp, Hkv * D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [block_tables, context_lens, step_arr, qfull, k_pool_l, v_pool_l]
    scratch = [
        pltpu.VMEM((2, npg * block_size, Hkv * D), k_pool_l.dtype),
        pltpu.VMEM((2, npg * block_size, Hkv * D), v_pool_l.dtype),
    ]
    if quantized:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY), pl.BlockSpec(memory_space=pl.ANY)]
        operands += [k_scale_l, v_scale_l]
        scratch += [
            pltpu.VMEM((2, Hkv, npg * block_size), jnp.float32),
            pltpu.VMEM((2, Hkv, npg * block_size), jnp.float32),
        ]
    if has_stash:
        J = stash_k.shape[0]
        assert J % 8 == 0, "stash-aware paged kernel needs J % 8 == 0"
        in_specs += [
            pl.BlockSpec((1, J, Hkv * D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J, Hkv * D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ]
        operands += [
            jnp.swapaxes(stash_k.reshape(J, B, Hkv * D), 0, 1),
            jnp.swapaxes(stash_v.reshape(J, B, Hkv * D), 0, 1),
        ]
    scratch += [
        pltpu.VMEM((Hkv * Gp, Hkv * D), jnp.float32),
        pltpu.VMEM((Hkv * Gp, 128), jnp.float32),
        pltpu.VMEM((Hkv * Gp, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((2, npg, 4 if quantized else 2)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, Hkv * Gp, Hkv * D), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, bs=block_size, nb=nb, Gp=Gp, scale=scale,
            window=sliding_window, quantized=quantized, npg=npg,
            has_stash=has_stash,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv * Gp, Hkv * D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(*operands)
    # Extract the head-diagonal blocks: row (g, h), lane block h.
    out5 = out.reshape(B, Gp, Hkv, Hkv, D)
    eye_f = jnp.eye(Hkv, dtype=jnp.float32)
    o = jnp.einsum("bghkd,hk->bhgd", out5, eye_f)
    return o[:, :, :G, :].reshape(B, H, D).astype(q.dtype)
