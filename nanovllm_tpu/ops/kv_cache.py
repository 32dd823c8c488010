"""Physical paged KV-cache pool.

This makes the reference's paged KV *real*. In nano-vllm-go the BlockManager's
block tables are pure metadata that never index actual storage — true KV lives
in per-sequence tensors grown by O(n^2) re-concatenation each decode step
(/root/reference/purego/tensor/kv_cache.go, attention.go:239-244;
SURVEY.md §2.5-1). Here the pool is a preallocated on-device array

    k, v : [num_layers * num_blocks * block_size, num_kv_heads * head_dim]

— ONE flat slot-major buffer for all layers (slot = layer * slots_per_layer +
block_id * block_size + offset), written via shape-stable scatters driven by a
per-token `slot_mapping` array and read via block-table gathers. Optional INT8
KV quantization stores int8 values plus per-(slot, head) fp32 scales (new
capability; BASELINE.json north star).

Why flat and not [L, slots, Hkv*D]: per-layer updates on a layer-major pool
lower to slice→scatter→dynamic-update-slice, and XLA materializes the sliced
layer (~tens of MB) twice per layer per step — measured ~5x decode slowdown
at 1GB pools, scaling with pool size. A flat pool makes every layer's write a
scatter *into the carried buffer itself* (row indices offset by
layer * slots_per_layer), which XLA performs in place on donated/loop-carried
buffers. The layer index may be a traced scalar, so lax.scan over layers gets
the same zero-copy path.

Layout note (TPU tiling): heads are FOLDED into the minor dim — [slots,
Hkv*D] — not [slots, Hkv, D]. TPU tiles pad the two minor dims to
(8,128)-multiples; with (Hkv, D) minor a GQA pool (Hkv=4..8, D=64) pads 2-8x
in HBM (observed: a 2GB pool padded to 16GB). Hkv*D is 512+ for every real
model, so the folded layout pads nothing. Scales are stored [Hkv, slots]
(slots in the lane dim) for the same reason.

All writes use out-of-bounds slot indices with mode='drop' for padding lanes.
Callers pass PER-LAYER slot ids with the per-layer slot count as the OOB
sentinel; `kv_write` rebases in-bounds ids by layer * nslots and maps the
sentinel to the global row count so padding still drops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Historical note: a Pallas grouped-RMW row writer (8-row-group DMAs) once
# lived at ops/pallas/kv_write.py for the per-step decode scatter. In
# isolation it beat XLA's row-serialized scatter 24x, but in the full decode
# step it benched ~3% SLOWER (XLA overlaps the scatter with surrounding
# compute; the aliased pallas_call serializes), and burst-deferred writes
# (models/model.py decode_step_burst) then removed the per-step scatter from
# the default path entirely — one scatter per burst instead of layers*burst.
# The kernel was retired in r3 (git history has it).


def create_kv_pool(
    num_layers: int,
    num_blocks: int,
    block_size: int,
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    quantized: bool = False,
) -> dict:
    total = num_layers * num_blocks * block_size
    shape = (total, num_kv_heads * head_dim)
    scale_shape = (num_kv_heads, total)
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


def _rebase(slot_mapping: jnp.ndarray, layer, nslots: int, total: int) -> jnp.ndarray:
    """Per-layer slot ids -> flat pool rows. The per-layer OOB sentinel
    (>= nslots) maps to the global row count so scatters still drop it."""
    return jnp.where(
        slot_mapping >= nslots, total, slot_mapping + layer * nslots
    ).astype(jnp.int32)


def kv_write(
    pool: dict,
    layer,                      # int or traced int32 scalar
    nslots: int,                # slots per layer (static)
    k: jnp.ndarray,             # [T, Hkv, D]
    v: jnp.ndarray,
    slot_mapping: jnp.ndarray,  # [T] per-layer slot ids (OOB => padding)
    decode: bool = False,       # kept for call-site symmetry (burst path defers)
) -> dict:
    """Scatter one layer's K/V rows into the flat pool (in place on carried
    buffers — no layer slice ever materializes)."""
    T = k.shape[0]
    total = pool["k"].shape[0]
    rows = _rebase(slot_mapping, layer, nslots, total)
    out = dict(pool)
    if pool["k"].dtype == jnp.int8:
        qk, sk = _quantize_kv(k)
        qv, sv = _quantize_kv(v)
        out["k"] = pool["k"].at[rows].set(qk.reshape(T, -1), mode="drop")
        out["v"] = pool["v"].at[rows].set(qv.reshape(T, -1), mode="drop")
        # x[:, idx] keeps the advanced axis in place (single adjacent
        # advanced index), so the update value is [Hkv, T].
        out["k_scale"] = pool["k_scale"].at[:, rows].set(sk.T, mode="drop")
        out["v_scale"] = pool["v_scale"].at[:, rows].set(sv.T, mode="drop")
    else:
        dt = pool["k"].dtype
        out["k"] = pool["k"].at[rows].set(k.astype(dt).reshape(T, -1), mode="drop")
        out["v"] = pool["v"].at[rows].set(v.astype(dt).reshape(T, -1), mode="drop")
    return out


def kv_gather(
    pool: dict,
    layer,                      # int or traced int32 scalar
    nslots: int,                # slots per layer (static)
    block_tables: jnp.ndarray,  # [B, max_blocks] per-layer physical block ids
    block_size: int,
    num_kv_heads: int,
    dtype=jnp.bfloat16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather context KV for a batch of sequences from layer `layer`.

    Padding block-table entries may be any valid id — callers mask by context
    length. Returns k, v of shape [B, max_blocks * block_size, Hkv, D] in
    `dtype` (dequantized if the pool is INT8).
    """
    bs = block_size
    B, nb = block_tables.shape
    slots = block_tables[:, :, None] * bs + jnp.arange(bs, dtype=block_tables.dtype)[None, None, :]
    slots = slots.reshape(B, nb * bs) + layer * nslots
    S = nb * bs
    Hkv = num_kv_heads
    k = jnp.take(pool["k"], slots, axis=0)  # [B, S, Hkv*D]
    v = jnp.take(pool["v"], slots, axis=0)
    D = k.shape[-1] // Hkv
    k = k.reshape(B, S, Hkv, D)
    v = v.reshape(B, S, Hkv, D)
    if pool["k"].dtype == jnp.int8:
        ks = jnp.take(pool["k_scale"], slots, axis=1)  # [Hkv, B, S]
        vs = jnp.take(pool["v_scale"], slots, axis=1)
        k = k.astype(jnp.float32) * ks.transpose(1, 2, 0)[..., None]
        v = v.astype(jnp.float32) * vs.transpose(1, 2, 0)[..., None]
    return k.astype(dtype), v.astype(dtype)


def make_slot_mapping(
    block_table: np.ndarray, start: int, length: int, block_size: int, pad_to: int, num_slots: int
) -> np.ndarray:
    """Host-side helper: per-layer flat slot ids for tokens
    [start, start+length) of a sequence with the given (logical-order) block
    table; padded to `pad_to` with `num_slots` (the per-layer OOB sentinel
    that kv_write drops)."""
    pos = np.arange(start, start + length)
    blocks = np.asarray(block_table)[pos // block_size]
    slots = blocks * block_size + pos % block_size
    out = np.full((pad_to,), num_slots, dtype=np.int32)
    out[:length] = slots
    return out
