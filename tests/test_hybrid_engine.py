"""Granite-4.0-hybrid (Mamba2 + attention) through the FULL engine: decode
with per-slot recurrent state must reproduce teacher-forced prefill logits,
and the LLM path must generate deterministically."""

import numpy as np
import jax.numpy as jnp

from nanovllm_tpu.config import (
    ActivationType, EngineConfig, LayerKind, ModelConfig, NormType, PositionType,
)
from nanovllm_tpu.engine.llm import LLM
from nanovllm_tpu.models import model as M
from nanovllm_tpu.ops import kv_cache as kvc
from nanovllm_tpu.ops import mamba2 as mo
from nanovllm_tpu.sampling_params import SamplingParams

BS = 16


def hybrid_cfg():
    return ModelConfig(
        vocab_size=97, hidden_size=48, num_layers=3, num_heads=4, num_kv_heads=2,
        intermediate_size=64, max_seq_len=128,
        norm_type=NormType.RMSNORM, position_type=PositionType.ROPE,
        activation=ActivationType.SWIGLU,
        layer_kinds=(LayerKind.MAMBA2, LayerKind.ATTENTION, LayerKind.MAMBA2),
        mamba_d_state=16, mamba_d_conv=4, mamba_n_heads=4, mamba_head_dim=12,
        mamba_n_groups=1, hybrid_attn_rope=False,
        dtype="float32", eos_token_id=0,
    )


def test_hybrid_decode_matches_prefill():
    cfg = hybrid_cfg()
    params = M.init_params(cfg, seed=2)
    rng = np.random.default_rng(7)
    tokens = rng.integers(1, cfg.vocab_size, size=24).tolist()
    bt = np.array([0, 1], np.int32)

    def prefill(toks, pool, state, slot):
        T = len(toks)
        sm = kvc.make_slot_mapping(bt, 0, T, BS, T, 8 * BS)
        return M.prefill_chunk(
            params, cfg, jnp.asarray(np.array(toks, np.int32)),
            jnp.arange(T, dtype=jnp.int32), jnp.int32(T), jnp.int32(T),
            jnp.asarray(bt), jnp.asarray(sm), pool, state, jnp.int32(slot), BS,
        )

    # Reference: one full prefill of 24 tokens.
    pool = kvc.create_kv_pool(cfg.num_layers, 8, BS, cfg.num_kv_heads, cfg.head_dim, dtype=jnp.float32)
    state = mo.create_mamba_state(cfg, 2)
    ref_logits, _, _ = prefill(tokens, pool, state, 0)

    # Paged path: prefill 20 then 4 teacher-forced decode steps at slot 1.
    pool = kvc.create_kv_pool(cfg.num_layers, 8, BS, cfg.num_kv_heads, cfg.head_dim, dtype=jnp.float32)
    state = mo.create_mamba_state(cfg, 2)
    logits, pool, state = prefill(tokens[:20], pool, state, 1)
    Bn = 2
    for i in range(20, 24):
        tok = np.zeros((Bn,), np.int32)
        pos = np.zeros((Bn,), np.int32)
        ctx = np.ones((Bn,), np.int32)
        bts = np.zeros((Bn, 2), np.int32)
        sm = np.full((Bn,), 8 * BS, np.int32)
        tok[1] = tokens[i]
        pos[1] = i
        ctx[1] = i + 1
        bts[1] = bt
        sm[1] = bt[i // BS] * BS + i % BS
        logits_b, pool, state = M.decode_step(
            params, cfg, jnp.asarray(tok), jnp.asarray(pos), jnp.asarray(ctx),
            jnp.asarray(bts), jnp.asarray(sm), pool, state, BS,
        )
        logits = logits_b[1]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=5e-4, atol=5e-4)


def test_hybrid_llm_end_to_end():
    cfg = hybrid_cfg()
    ecfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=2, max_model_len=128,
        kv_block_size=BS, max_decode_slots=2, min_prefill_bucket=16,
        num_kv_blocks=16, eos_token_id=0, decode_burst=4,
    )
    llm = LLM(model_config=cfg, engine_config=ecfg)
    assert llm.engine_config.enable_prefix_caching is False  # forced for hybrids
    outs = llm.generate([[3, 4, 5, 6], [7, 8, 9]], SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    outs2 = llm.generate([[3, 4, 5, 6], [7, 8, 9]], SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    for a, b in zip(outs, outs2):
        assert a.token_ids == b.token_ids and len(a.token_ids) == 6
