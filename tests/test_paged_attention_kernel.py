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


@pytest.mark.parametrize("quantized,window", [
    (False, 0), (False, 24), (True, 0),
])
def test_paged_kernel_with_stash_matches_stashed_reference(quantized, window):
    """Stash-aware paged kernel (burst-deferred KV composing with the page
    walk — VERDICT r4 #4) vs attention_decode_stashed numerics oracle."""
    from nanovllm_tpu.ops.attention import attention_decode_stashed
    from nanovllm_tpu.ops.kv_cache import _quantize_kv

    rng = np.random.default_rng(11)
    B, H, Hkv, D, nb, J = 3, 8, 2, 64, 4, 8
    slots = 8 * BS
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    k_pool = rng.standard_normal((slots, Hkv * D)).astype(np.float32)
    v_pool = rng.standard_normal((slots, Hkv * D)).astype(np.float32)
    block_tables = np.stack([rng.permutation(8)[:nb] for _ in range(B)]).astype(np.int32)
    ctx0 = np.array([20, 2, 4 * BS], np.int32)  # context at burst start
    stash_k = rng.standard_normal((J, B, Hkv, D)).astype(np.float32)
    stash_v = rng.standard_normal((J, B, Hkv, D)).astype(np.float32)
    scale = 1.0 / np.sqrt(D)
    step = 5

    ks = vs = None
    if quantized:
        qk, sk_ = _quantize_kv(jnp.asarray(k_pool.reshape(slots, Hkv, D)))
        qv, sv_ = _quantize_kv(jnp.asarray(v_pool.reshape(slots, Hkv, D)))
        k_pool_dev = qk.reshape(slots, Hkv * D)
        v_pool_dev = qv.reshape(slots, Hkv * D)
        ks, vs = sk_.T, sv_.T  # [Hkv, slots]
        # The reference sees the dequantized pool (kernel numerics are exact
        # given the same quantized values).
        k_pool = np.asarray(qk.astype(np.float32) * sk_[..., None]).reshape(slots, Hkv * D)
        v_pool = np.asarray(qv.astype(np.float32) * sv_[..., None]).reshape(slots, Hkv * D)
    else:
        k_pool_dev = jnp.asarray(k_pool)
        v_pool_dev = jnp.asarray(v_pool)

    pa.set_interpret(True)
    try:
        out = pa.paged_attention_decode(
            jnp.asarray(q), k_pool_dev, v_pool_dev,
            jnp.asarray(block_tables), jnp.asarray(ctx0 - 1),  # pool-valid rows
            Hkv, BS, scale, window,
            k_scale_l=ks, v_scale_l=vs,
            stash_k=jnp.asarray(stash_k), stash_v=jnp.asarray(stash_v),
            step_idx=jnp.int32(step),
        )
    finally:
        pa.set_interpret(False)

    slots_idx = block_tables[:, :, None] * BS + np.arange(BS)[None, None, :]
    slots_idx = slots_idx.reshape(B, nb * BS)
    k_ctx = k_pool[slots_idx].reshape(B, nb * BS, Hkv, D)
    v_ctx = v_pool[slots_idx].reshape(B, nb * BS, Hkv, D)
    ref = attention_decode_stashed(
        jnp.asarray(q), jnp.asarray(k_ctx), jnp.asarray(v_ctx),
        jnp.asarray(stash_k), jnp.asarray(stash_v),
        jnp.asarray(ctx0), jnp.int32(step), scale, window,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_engine_deferred_burst_with_paged_kernel_matches():
    """Engine-level: burst-deferred decode riding the stash-aware paged
    kernel (forced + interpret) must match the XLA path exactly."""
    from nanovllm_tpu.config import (
        ActivationType, EngineConfig, ModelConfig, NormType, PositionType,
    )
    from nanovllm_tpu.engine.llm import LLM
    from nanovllm_tpu.models import model as M
    from nanovllm_tpu.sampling_params import SamplingParams

    cfg = ModelConfig(
        vocab_size=97, hidden_size=48, num_layers=2, num_heads=4, num_kv_heads=2,
        intermediate_size=64, max_seq_len=256, norm_type=NormType.RMSNORM,
        position_type=PositionType.ROPE, activation=ActivationType.SWIGLU,
        dtype="float32", eos_token_id=0,
    )
    params = M.init_params(cfg, seed=13)
    prompts = [list(range(1, 40)), list(range(2, 25)), [3, 4]]
    sp = SamplingParams(temperature=0.0, max_tokens=18, ignore_eos=True)

    def run():
        ecfg = EngineConfig(
            max_num_batched_tokens=4096, max_num_seqs=4, max_model_len=128,
            kv_block_size=BS, max_decode_slots=4, min_prefill_bucket=16,
            num_kv_blocks=64, eos_token_id=0, decode_burst=8,
            deferred_kv_writes=True,
        )
        llm = LLM(model_config=cfg, engine_config=ecfg, params=params)
        return llm.generate(prompts, sp)

    ref = run()
    M.set_use_paged_kernel(True)
    pa.set_interpret(True)
    try:
        out = run()
    finally:
        M.set_use_paged_kernel(None)
        pa.set_interpret(False)
    for a, b in zip(ref, out):
        assert a.token_ids == b.token_ids
