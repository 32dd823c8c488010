"""Fused decode-attention kernel (interpret mode) vs the XLA
attention_decode_stashed oracle, and the full engine with the fused path
(pregather + bhjd + fused kernel, all interpreted) vs the plain XLA path."""

import numpy as np
import jax.numpy as jnp
import pytest

from nanovllm_tpu.config import ActivationType, ModelConfig, NormType, PositionType
from nanovllm_tpu.models import model as M
from nanovllm_tpu.ops.attention import attention_decode_stashed
from nanovllm_tpu.ops.pallas import fused_decode_attention as fa
from nanovllm_tpu.ops.pallas import kv_flush, kv_pregather


@pytest.mark.parametrize("window,step", [(0, 0), (0, 5), (24, 7)])
def test_fused_kernel_matches_oracle(window, step):
    B, H, Hkv, D, S, J = 4, 16, 8, 64, 128, 8
    assert fa.fused_supported(B, H, Hkv, D, S, J)
    rng = np.random.default_rng(step * 10 + window)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float32)
    k_ctx = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    v_ctx = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    sk = jnp.asarray(rng.standard_normal((B, Hkv, J, D)), jnp.float32)
    sv = jnp.asarray(rng.standard_normal((B, Hkv, J, D)), jnp.float32)
    ctx0 = jnp.asarray(rng.integers(1, S, B).astype(np.int32))
    scale = 0.125

    ref = attention_decode_stashed(
        q, k_ctx, v_ctx, sk, sv, ctx0, jnp.int32(step), scale, window,
        stash_layout="bhjd",
    )
    ctx_mask, stash_mask = fa.decode_masks(ctx0, jnp.int32(step), S, J, window)
    # Full [L, ...] buffers with the real layer at index 1 (index 0 holds
    # decoys — the scalar-prefetched block index map must skip them).
    L = 2
    decoy = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    kT = jnp.stack([jnp.transpose(x, (0, 2, 3, 1)) for x in (decoy, k_ctx)])
    vT = jnp.stack([jnp.transpose(x, (0, 2, 3, 1)) for x in (decoy, v_ctx)])
    skL = jnp.stack([sv, sk])
    svL = jnp.stack([sk, sv])
    fa.set_interpret(True)
    try:
        out = fa.fused_decode_attention(
            q, kT, vT, skL, svL, ctx_mask, stash_mask, jnp.int32(1), scale,
        )
    finally:
        fa.set_interpret(False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_engine_decode_with_fused_kernel_matches(monkeypatch):
    """Full engine generation with pregather + fused attention (interpret)
    must match the plain XLA hoisted path token-for-token."""
    from nanovllm_tpu.config import EngineConfig
    from nanovllm_tpu.engine.llm import LLM
    from nanovllm_tpu.sampling_params import SamplingParams

    # head_dim 64 (fused_supported's minor-dim rule)
    cfg = ModelConfig(
        vocab_size=97, hidden_size=512, num_layers=2, num_heads=8,
        num_kv_heads=8, intermediate_size=96, max_seq_len=256,
        norm_type=NormType.RMSNORM, position_type=PositionType.ROPE,
        activation=ActivationType.SWIGLU, dtype="float32", eos_token_id=0,
    )
    params = M.init_params(cfg, seed=7)
    prompts = [list(range(1, 40)), list(range(2, 20)), [5, 6]]
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)

    def run():
        ecfg = EngineConfig(
            max_num_batched_tokens=4096, max_num_seqs=4, max_model_len=256,
            kv_block_size=128, max_decode_slots=4, min_prefill_bucket=16,
            num_kv_blocks=64, eos_token_id=0, decode_burst=8,
            deferred_kv_writes=True,
        )
        llm = LLM(model_config=cfg, engine_config=ecfg, params=params)
        outs = llm.generate(prompts, sp)
        keys = list(llm.engine.runner._decode_cache)
        return outs, keys

    monkeypatch.setenv("NANOVLLM_FUSED_ATTN", "0")
    ref, _ = run()
    monkeypatch.setenv("NANOVLLM_FUSED_ATTN", "1")
    monkeypatch.setenv("NANOVLLM_PREGATHER_KERNEL", "1")
    for mod in (fa, kv_pregather, kv_flush):
        mod.set_interpret(True)
    try:
        out, keys = run()
    finally:
        for mod in (fa, kv_pregather, kv_flush):
            mod.set_interpret(False)
    assert any(k[0] == "burst" and k[-1] for k in keys), keys  # fused ran
    for a, b in zip(ref, out):
        assert a.token_ids == b.token_ids
