"""Pallas paged decode attention (interpret mode) vs the XLA gather
reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from nanovllm_tpu.ops.attention import attention_decode
from nanovllm_tpu.ops.pallas import paged_attention as pa

BS = 16


def run_case(B, H, Hkv, D, nb, ctx_lens, window=0, seed=0):
    rng = np.random.default_rng(seed)
    slots = 8 * BS
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    k_pool = rng.standard_normal((slots, Hkv * D)).astype(np.float32)
    v_pool = rng.standard_normal((slots, Hkv * D)).astype(np.float32)
    bts = rng.permutation(8)[:nb]
    block_tables = np.stack([rng.permutation(8)[:nb] for _ in range(B)]).astype(np.int32)
    ctx = np.array(ctx_lens, np.int32)
    scale = 1.0 / np.sqrt(D)

    pa.set_interpret(True)
    try:
        out_k = pa.paged_attention_decode(
            jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
            jnp.asarray(block_tables), jnp.asarray(ctx), Hkv, BS, scale, window,
        )
    finally:
        pa.set_interpret(False)

    # Reference: gather + dense masked attention.
    slots_idx = block_tables[:, :, None] * BS + np.arange(BS)[None, None, :]
    slots_idx = slots_idx.reshape(B, nb * BS)
    k_ctx = k_pool[slots_idx].reshape(B, nb * BS, Hkv, D)
    v_ctx = v_pool[slots_idx].reshape(B, nb * BS, Hkv, D)
    ref = attention_decode(
        jnp.asarray(q), jnp.asarray(k_ctx), jnp.asarray(v_ctx), jnp.asarray(ctx),
        scale, window,
    )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gqa_ragged_lengths():
    run_case(B=3, H=8, Hkv=2, D=32, nb=4, ctx_lens=[5, 33, 64])


def test_mha():
    run_case(B=2, H=4, Hkv=4, D=16, nb=2, ctx_lens=[17, 32])


def test_mqa_many_groups():
    run_case(B=2, H=12, Hkv=1, D=16, nb=3, ctx_lens=[48, 7])


def test_sliding_window():
    run_case(B=2, H=4, Hkv=2, D=16, nb=4, ctx_lens=[60, 44], window=20)


def test_single_token_context():
    run_case(B=2, H=4, Hkv=2, D=16, nb=2, ctx_lens=[1, 2])


def test_int8_kv_fused_dequant():
    """Quantized-pool variant: scales folded into scores/probs must match
    dequantize-then-attend."""
    rng = np.random.default_rng(3)
    B, H, Hkv, D, nb = 2, 8, 2, 32, 3
    slots = 8 * BS
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    k_f = rng.standard_normal((slots, Hkv, D)).astype(np.float32)
    v_f = rng.standard_normal((slots, Hkv, D)).astype(np.float32)
    # per (slot, head) symmetric int8
    ks = np.abs(k_f).max(axis=-1) / 127.0 + 1e-8
    vs = np.abs(v_f).max(axis=-1) / 127.0 + 1e-8
    k_q = np.clip(np.rint(k_f / ks[..., None]), -127, 127).astype(np.int8)
    v_q = np.clip(np.rint(v_f / vs[..., None]), -127, 127).astype(np.int8)
    block_tables = np.stack([rng.permutation(8)[:nb] for _ in range(B)]).astype(np.int32)
    ctx = np.array([17, 40], np.int32)
    scale = 1.0 / np.sqrt(D)

    pa.set_interpret(True)
    try:
        out_k = pa.paged_attention_decode(
            jnp.asarray(q),
            jnp.asarray(k_q.reshape(slots, Hkv * D)),
            jnp.asarray(v_q.reshape(slots, Hkv * D)),
            jnp.asarray(block_tables), jnp.asarray(ctx), Hkv, BS, scale,
            k_scale_l=jnp.asarray(ks.T.copy()),  # [Hkv, slots]
            v_scale_l=jnp.asarray(vs.T.copy()),
        )
    finally:
        pa.set_interpret(False)

    k_deq = (k_q.astype(np.float32) * ks[..., None])
    v_deq = (v_q.astype(np.float32) * vs[..., None])
    slots_idx = block_tables[:, :, None] * BS + np.arange(BS)[None, None, :]
    slots_idx = slots_idx.reshape(B, nb * BS)
    ref = attention_decode(
        jnp.asarray(q), jnp.asarray(k_deq[slots_idx]), jnp.asarray(v_deq[slots_idx]),
        jnp.asarray(ctx), scale,
    )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref), rtol=2e-5, atol=2e-5)
