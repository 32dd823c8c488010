"""Physical paged KV-cache pool.

This makes the reference's paged KV *real*. In nano-vllm-go the BlockManager's
block tables are pure metadata that never index actual storage — true KV lives
in per-sequence tensors grown by O(n^2) re-concatenation each decode step
(/root/reference/purego/tensor/kv_cache.go, attention.go:239-244;
SURVEY.md §2.5-1). Here the pool is a preallocated on-device array

    k, v : [num_layers, num_blocks * block_size, num_kv_heads, head_dim]

(a flat "slot" view of the block pool — slot = block_id * block_size +
offset), written via shape-stable scatters driven by a per-token
`slot_mapping` array and read via block-table gathers. Optional INT8 KV
quantization stores int8 values plus per-(slot, head) fp32 scales (new
capability; BASELINE.json north star).

Layout note (TPU tiling): the pool stores K/V with heads FOLDED into the
minor dim — [L, slots, Hkv*D] — not [L, slots, Hkv, D]. TPU tiles pad the
two minor dims to (8,128)-multiples; with (Hkv, D) minor a GQA pool
(Hkv=4..8, D=64) pads 2-8x in HBM (observed: a 2GB pool padded to 16GB).
Hkv*D is 512+ for every real model, so the folded layout pads nothing.
Scales are stored [L, Hkv, slots] for the same reason (slots in the lane
dim). Per-(token, head) writes/reads reshape at the gather/scatter boundary
where the data is small.

All writes use out-of-bounds slot indices with mode='drop' for padding lanes,
so prefill chunks and decode batches keep static shapes under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def create_kv_pool(
    num_layers: int,
    num_blocks: int,
    block_size: int,
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    quantized: bool = False,
) -> dict:
    nslots = num_blocks * block_size
    shape = (num_layers, nslots, num_kv_heads * head_dim)
    scale_shape = (num_layers, num_kv_heads, nslots)
    if quantized:
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(scale_shape, jnp.float32),
            "v_scale": jnp.zeros(scale_shape, jnp.float32),
        }
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
    }


def kv_pool_bytes(num_layers, num_blocks, block_size, num_kv_heads, head_dim, dtype, quantized=False) -> int:
    nslots = num_blocks * block_size
    if quantized:
        per = 1 + 4 / head_dim
    else:
        per = jnp.dtype(dtype).itemsize
    return int(2 * num_layers * nslots * num_kv_heads * head_dim * per)


def _quantize_kv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x [T, H, D] -> (int8 values, fp32 scales [T, H]) symmetric per head-token."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def kv_write_layer(pool_l: dict, k: jnp.ndarray, v: jnp.ndarray, slot_mapping: jnp.ndarray) -> dict:
    """Layer-local scatter: pool_l holds one layer's arrays ('k'/'v'
    [slots, Hkv*D], scales [Hkv, slots]). Used directly by the
    scan-over-layers fast path."""
    T = k.shape[0]
    out = dict(pool_l)
    if pool_l["k"].dtype == jnp.int8:
        qk, sk = _quantize_kv(k)
        qv, sv = _quantize_kv(v)
        out["k"] = pool_l["k"].at[slot_mapping].set(qk.reshape(T, -1), mode="drop")
        out["v"] = pool_l["v"].at[slot_mapping].set(qv.reshape(T, -1), mode="drop")
        # x[:, idx] keeps the advanced axis in place (single adjacent
        # advanced index), so the update value is [Hkv, T].
        out["k_scale"] = pool_l["k_scale"].at[:, slot_mapping].set(sk.T, mode="drop")
        out["v_scale"] = pool_l["v_scale"].at[:, slot_mapping].set(sv.T, mode="drop")
    else:
        dt = pool_l["k"].dtype
        out["k"] = pool_l["k"].at[slot_mapping].set(k.astype(dt).reshape(T, -1), mode="drop")
        out["v"] = pool_l["v"].at[slot_mapping].set(v.astype(dt).reshape(T, -1), mode="drop")
    return out


def pool_layer(pool: dict, layer: int) -> dict:
    return {k: v[layer] for k, v in pool.items()}


def set_pool_layer(pool: dict, layer: int, pool_l: dict) -> dict:
    return {k: pool[k].at[layer].set(pool_l[k]) for k in pool}


def kv_write(pool: dict, layer: int, k: jnp.ndarray, v: jnp.ndarray, slot_mapping: jnp.ndarray) -> dict:
    """Indexed wrapper over kv_write_layer (used by the per-layer Python loop
    for heterogeneous/hybrid models)."""
    T = k.shape[0]
    out = dict(pool)
    if pool["k"].dtype == jnp.int8:
        qk, sk = _quantize_kv(k)
        qv, sv = _quantize_kv(v)
        out["k"] = pool["k"].at[layer, slot_mapping].set(qk.reshape(T, -1), mode="drop")
        out["v"] = pool["v"].at[layer, slot_mapping].set(qv.reshape(T, -1), mode="drop")
        out["k_scale"] = pool["k_scale"].at[layer, :, slot_mapping].set(sk, mode="drop")
        out["v_scale"] = pool["v_scale"].at[layer, :, slot_mapping].set(sv, mode="drop")
    else:
        dt = pool["k"].dtype
        out["k"] = pool["k"].at[layer, slot_mapping].set(k.astype(dt).reshape(T, -1), mode="drop")
        out["v"] = pool["v"].at[layer, slot_mapping].set(v.astype(dt).reshape(T, -1), mode="drop")
    return out


def kv_gather(
    pool: dict,
    layer: int,
    block_tables: jnp.ndarray,
    block_size: int,
    num_kv_heads: int,
    dtype=jnp.bfloat16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather context KV for a batch of sequences.

    block_tables [B, max_blocks] (physical block ids; padding entries may be
    any valid id — callers mask by context length). Returns k, v of shape
    [B, max_blocks * block_size, Hkv, D] in `dtype` (dequantized if the pool
    is INT8).
    """
    return kv_gather_layer(pool_layer(pool, layer), block_tables, block_size, num_kv_heads, dtype)


def kv_gather_layer(
    pool_l: dict,
    block_tables: jnp.ndarray,
    block_size: int,
    num_kv_heads: int,
    dtype=jnp.bfloat16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    bs = block_size
    B, nb = block_tables.shape
    slots = block_tables[:, :, None] * bs + jnp.arange(bs, dtype=block_tables.dtype)[None, None, :]
    slots = slots.reshape(B, nb * bs)
    S = nb * bs
    Hkv = num_kv_heads
    k = jnp.take(pool_l["k"], slots, axis=0)  # [B, S, Hkv*D]
    v = jnp.take(pool_l["v"], slots, axis=0)
    D = k.shape[-1] // Hkv
    k = k.reshape(B, S, Hkv, D)
    v = v.reshape(B, S, Hkv, D)
    if pool_l["k"].dtype == jnp.int8:
        ks = jnp.take(pool_l["k_scale"], slots, axis=1)  # [Hkv, B, S]
        vs = jnp.take(pool_l["v_scale"], slots, axis=1)
        k = k.astype(jnp.float32) * ks.transpose(1, 2, 0)[..., None]
        v = v.astype(jnp.float32) * vs.transpose(1, 2, 0)[..., None]
    return k.astype(dtype), v.astype(dtype)


def make_slot_mapping(
    block_table: np.ndarray, start: int, length: int, block_size: int, pad_to: int, num_slots: int
) -> np.ndarray:
    """Host-side helper: flat slot ids for tokens [start, start+length) of a
    sequence with the given (logical-order) block table; padded to `pad_to`
    with `num_slots` (an OOB slot that scatters drop)."""
    pos = np.arange(start, start + length)
    blocks = np.asarray(block_table)[pos // block_size]
    slots = blocks * block_size + pos % block_size
    out = np.full((pad_to,), num_slots, dtype=np.int32)
    out[:length] = slots
    return out
