"""Ring attention: context-parallel prefill over the mesh (sequence
parallelism / CP).

The capability SURVEY.md §5 lists as the long-context stretch goal beyond the
reference (which caps context at a precomputed RoPE table and materializes
full score matrices — /root/reference/purego/tensor/rope.go:84-86,
attention.go:358). Here a single long prompt's attention is computed with
queries AND keys/values sharded over a mesh axis: each device holds T/P query
rows and S/P key rows; P ring steps rotate the KV shard around the axis with
`jax.lax.ppermute` while every device flash-accumulates (online softmax) its
local queries against the visiting KV shard. Peak per-device memory is
O(T/P * S/P) scores, activations O(T/P) — context scales linearly with the
ring size; ppermute rides ICI neighbor links (the classic ring schedule —
jax-ml.github.io/scaling-book collective model).

Pure-JAX formulation under shard_map: compiles on any backend (tested
numerically on the 8-device CPU mesh like the rest of the parallel layer) and
lowers ppermute to ICI collective-permute on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _flash_block(q, k, v, mask, scale, m, l, acc):
    """One online-softmax accumulation step.
    q [Tl, H, D], k/v [Sl, Hkv, D], mask [Tl, Sl] -> updated (m, l, acc)
    with m/l [Hkv, G, Tl, 1], acc [Tl, H, D]-shaped [Hkv, G, Tl, D]."""
    Hkv = k.shape[-2]
    Tl, H, D = q.shape
    G = H // Hkv
    qg = q.reshape(Tl, Hkv, G, D).astype(jnp.float32)
    s = jnp.einsum("thgd,shd->hgts", qg, k.astype(jnp.float32)) * scale
    s = jnp.where(mask[None, None, :, :], s, NEG_INF)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.einsum("hgts,shd->hgtd", p, v.astype(jnp.float32))
    acc_new = acc * alpha + pv
    return m_new, l_new, acc_new


def _ring_body(q, k, v, q_pos, k_pos, scale, axis, sliding_window,
               prefix_k=None, prefix_v=None, prefix_pos=None, prefix_len=None):
    """shard_map body: q [Tl, H, D] local queries, k/v [Sl, Hkv, D] local KV,
    q_pos [Tl] / k_pos [Sl] absolute positions. The optional prefix operands
    (REPLICATED pool-gathered KV for a prefix-cached prompt; rows with
    prefix_pos >= prefix_len are masked) are flash-accumulated in fixed-size
    chunks before the ring, so the score working set stays
    O(Tl * chunk) regardless of prefix length. Returns [Tl, H, D]."""
    P_ = jax.lax.axis_size(axis)
    Tl, H, D = q.shape
    Hkv = k.shape[-2]
    G = H // Hkv

    # pcast(to='varying'): the carry must be marked device-varying over the ring axis up
    # front (the loop writes varying values into it).
    m = jax.lax.pcast(jnp.full((Hkv, G, Tl, 1), NEG_INF, jnp.float32), (axis,), to='varying')
    l = jax.lax.pcast(jnp.zeros((Hkv, G, Tl, 1), jnp.float32), (axis,), to='varying')
    acc = jax.lax.pcast(jnp.zeros((Hkv, G, Tl, D), jnp.float32), (axis,), to='varying')

    if prefix_k is not None:
        CH = min(2048, prefix_k.shape[0])
        Spre = prefix_k.shape[0]
        n_chunks = (Spre + CH - 1) // CH
        pad = n_chunks * CH - Spre
        pk = jnp.pad(prefix_k, ((0, pad), (0, 0), (0, 0)))
        pv_ = jnp.pad(prefix_v, ((0, pad), (0, 0), (0, 0)))
        # Padding rows get position >= prefix_len => masked out.
        pp = jnp.pad(prefix_pos, (0, pad), constant_values=2**30)

        def pre_step(carry, inp):
            m, l, acc = carry
            kc, vc, posc = inp
            mask = (posc[None, :] < prefix_len) & (posc[None, :] <= q_pos[:, None])
            if sliding_window > 0:
                mask &= posc[None, :] > q_pos[:, None] - sliding_window
            m, l, acc = _flash_block(q, kc, vc, mask, scale, m, l, acc)
            return (m, l, acc), None

        (m, l, acc), _ = jax.lax.scan(
            pre_step, (m, l, acc),
            (
                pk.reshape(n_chunks, CH, Hkv, D),
                pv_.reshape(n_chunks, CH, Hkv, D),
                pp.reshape(n_chunks, CH),
            ),
        )

    perm = [(i, (i + 1) % P_) for i in range(P_)]

    def step(i, carry):
        k, v, k_pos, m, l, acc = carry
        mask = k_pos[None, :] <= q_pos[:, None]
        if sliding_window > 0:
            mask &= k_pos[None, :] > q_pos[:, None] - sliding_window
        m, l, acc = _flash_block(q, k, v, mask, scale, m, l, acc)
        # Rotate the KV shard (and its positions) to the next device.
        k = jax.lax.ppermute(k, axis, perm)
        v = jax.lax.ppermute(v, axis, perm)
        k_pos = jax.lax.ppermute(k_pos, axis, perm)
        return (k, v, k_pos, m, l, acc)

    k, v, k_pos, m, l, acc = jax.lax.fori_loop(
        0, P_, step, (k, v, k_pos, m, l, acc)
    )
    denom = jnp.maximum(l, 1e-30)
    out = (acc / denom).transpose(2, 0, 1, 3).reshape(Tl, H, D)
    return out.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,      # [T, H, D] global (sharded over `axis` on dim 0)
    k: jnp.ndarray,      # [S, Hkv, D]
    v: jnp.ndarray,
    q_positions: jnp.ndarray,  # [T] int32 absolute positions
    k_positions: jnp.ndarray,  # [S] int32
    mesh: Mesh,
    axis: str,
    scale: float,
    sliding_window: int = 0,
    prefix_k: jnp.ndarray | None = None,  # [Spre, Hkv, D] replicated pool KV
    prefix_v: jnp.ndarray | None = None,
    prefix_positions: jnp.ndarray | None = None,  # [Spre] int32
    prefix_len=None,  # scalar int32: rows with position >= this are masked
) -> jnp.ndarray:
    """Causal attention with q and kv sharded over `axis` (ring schedule).
    T and S must divide the axis size. The optional prefix operands score a
    prefix-cached prompt's pool KV as an extra (replicated, chunked) flash
    source — the CP-over-cached-prefix path (VERDICT r4 #9). Returns
    [T, H, D], sharded like q."""
    body = functools.partial(
        _ring_body, scale=scale, axis=axis, sliding_window=sliding_window
    )
    spec_q = P(axis, None, None)
    spec_kv = P(axis, None, None)
    spec_pos = P(axis)
    if prefix_k is not None:
        rep = P(None, None, None)

        def body_pre(q, k, v, q_pos, k_pos, pk, pv, pp, plen):
            return body(q, k, v, q_pos, k_pos, prefix_k=pk, prefix_v=pv,
                        prefix_pos=pp, prefix_len=plen)

        fn = jax.shard_map(
            body_pre,
            mesh=mesh,
            in_specs=(spec_q, spec_kv, spec_kv, spec_pos, spec_pos,
                      rep, rep, P(None), P()),
            out_specs=spec_q,
        )
        return fn(q, k, v, q_positions, k_positions,
                  prefix_k, prefix_v, prefix_positions,
                  jnp.asarray(prefix_len, jnp.int32))
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_q, spec_kv, spec_kv, spec_pos, spec_pos),
        out_specs=spec_q,
    )
    return fn(q, k, v, q_positions, k_positions)
