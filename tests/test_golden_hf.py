"""Golden-logit parity vs HuggingFace PyTorch (CPU) on tiny random models.

This is the reference's own QA methodology — layer-by-layer PyTorch diffing
(docs/ARCHITECTURE_GUIDE.md:1792-1816, executed throughout docs/changes/) —
promoted into CI, and the analog of its check-logits harness
(cmd/check-logits/main.go). Each architecture builds a tiny random HF model,
saves it with save_pretrained (exercising the full safetensors +
config.json load path), and compares prefill logits in fp32.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nanovllm_tpu.io.loader import load_model_dir
from nanovllm_tpu.models import model as M
from nanovllm_tpu.ops import kv_cache as kvc


def run_prefill_logits_all(cfg, params, tokens, block_size=16):
    """Our framework's full-prompt forward; returns last-token logits."""
    T = len(tokens)
    nb = (T + block_size - 1) // block_size + 1
    pool = kvc.create_kv_pool(
        cfg.num_layers, nb, block_size, cfg.num_kv_heads, cfg.head_dim, dtype=jnp.float32
    )
    mamba_state = None
    slot = None
    if cfg.is_hybrid:
        from nanovllm_tpu.ops import mamba2 as mo

        mamba_state = mo.create_mamba_state(cfg, 2)
        slot = jnp.int32(0)
    bt = np.arange(nb, dtype=np.int32)
    sm = kvc.make_slot_mapping(bt, 0, T, block_size, T, nb * block_size)
    logits, _, _ = M.prefill_chunk(
        params, cfg,
        jnp.asarray(np.array(tokens, np.int32)),
        jnp.arange(T, dtype=jnp.int32),
        jnp.int32(T), jnp.int32(T),
        jnp.asarray(bt), jnp.asarray(sm), pool,
        mamba_state, slot,
    )
    return np.asarray(logits)


def hf_last_logits(model, tokens):
    import torch

    with torch.no_grad():
        out = model(torch.tensor([tokens]))
    return out.logits[0, -1].float().numpy()


def check_model(tmp_path, hf_model, tokens, rtol=2e-4, atol=2e-4):
    d = str(tmp_path / "ckpt")
    hf_model.save_pretrained(d, safe_serialization=True)
    cfg, params = load_model_dir(d, dtype="float32")
    ours = run_prefill_logits_all(cfg, params, tokens)
    ref = hf_last_logits(hf_model, tokens)
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=atol)


TOKENS = [3, 14, 15, 9, 26, 5, 35, 8, 9, 7, 9, 3, 2, 38, 4, 6, 2, 6, 43, 38]


def test_gpt2_golden(tmp_path):
    from transformers import GPT2Config, GPT2LMHeadModel

    m = GPT2LMHeadModel(
        GPT2Config(n_embd=64, n_layer=2, n_head=4, vocab_size=101, n_positions=64)
    ).eval()
    check_model(tmp_path, m, TOKENS)


def test_llama_golden(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    m = LlamaForCausalLM(
        LlamaConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=112, vocab_size=101,
            rope_theta=10000.0, max_position_embeddings=128,
        )
    ).eval()
    check_model(tmp_path, m, TOKENS)


def test_llama3_rope_scaling_golden(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    m = LlamaForCausalLM(
        LlamaConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=112, vocab_size=101,
            rope_theta=10000.0, max_position_embeddings=128,
            rope_scaling={
                "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
                "high_freq_factor": 4.0, "original_max_position_embeddings": 32,
            },
        )
    ).eval()
    check_model(tmp_path, m, TOKENS)


def test_mistral_sliding_window_golden(tmp_path):
    from transformers import MistralConfig, MistralForCausalLM

    m = MistralForCausalLM(
        MistralConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=112, vocab_size=101,
            sliding_window=8, max_position_embeddings=128,
        )
    ).eval()
    # 20 tokens with window 8 actually exercises the windowed mask.
    check_model(tmp_path, m, TOKENS)


def test_falcon_mqa_golden(tmp_path):
    from transformers import FalconConfig, FalconForCausalLM

    m = FalconForCausalLM(
        FalconConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            multi_query=True, parallel_attn=True, new_decoder_architecture=False,
            alibi=False, bias=False, vocab_size=101,
        )
    ).eval()
    check_model(tmp_path, m, TOKENS)


def test_falcon40b_style_new_decoder_arch_golden(tmp_path):
    from transformers import FalconConfig, FalconForCausalLM

    m = FalconForCausalLM(
        FalconConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=8,
            num_kv_heads=2, multi_query=False, parallel_attn=True,
            new_decoder_architecture=True, alibi=False, bias=False, vocab_size=101,
        )
    ).eval()
    check_model(tmp_path, m, TOKENS)


def test_granite_moe_golden(tmp_path):
    from transformers import GraniteMoeConfig, GraniteMoeForCausalLM

    m = GraniteMoeForCausalLM(
        GraniteMoeConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=96, num_local_experts=8,
            num_experts_per_tok=2, vocab_size=101,
            embedding_multiplier=12.0, residual_multiplier=0.22,
            attention_multiplier=0.015625, logits_scaling=6.0,
        )
    ).eval()
    check_model(tmp_path, m, TOKENS, rtol=5e-4, atol=5e-4)


def test_granite_hybrid_mamba2_golden(tmp_path):
    pytest.importorskip("transformers.models.granitemoehybrid")
    from transformers import GraniteMoeHybridConfig, GraniteMoeHybridForCausalLM

    m = GraniteMoeHybridForCausalLM(
        GraniteMoeHybridConfig(
            hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=96,
            shared_intermediate_size=96, num_local_experts=0, vocab_size=101,
            mamba_n_heads=8, mamba_d_head=16, mamba_d_state=16,
            mamba_n_groups=1, mamba_d_conv=4,
            layer_types=["mamba", "attention", "mamba", "mamba"],
        )
    ).eval()
    check_model(tmp_path, m, TOKENS, rtol=1e-3, atol=1e-3)


def test_granite_hybrid_moe_golden(tmp_path):
    """Granite 4.0 full hybrid: Mamba2 + routed experts + shared expert."""
    pytest.importorskip("transformers.models.granitemoehybrid")
    from transformers import GraniteMoeHybridConfig, GraniteMoeHybridForCausalLM

    m = GraniteMoeHybridForCausalLM(
        GraniteMoeHybridConfig(
            hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=48,
            shared_intermediate_size=64, num_local_experts=4,
            num_experts_per_tok=2, vocab_size=101,
            mamba_n_heads=8, mamba_d_head=16, mamba_d_state=16,
            mamba_n_groups=1, mamba_d_conv=4,
            layer_types=["mamba", "attention", "mamba"],
        )
    ).eval()
    check_model(tmp_path, m, TOKENS, rtol=1e-3, atol=1e-3)


def test_sharded_checkpoint_golden(tmp_path):
    """Sharded safetensors (model.safetensors.index.json) load path
    (reference generic_loader.go:1042-1163)."""
    from transformers import LlamaConfig, LlamaForCausalLM

    m = LlamaForCausalLM(
        LlamaConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=112, vocab_size=101,
        )
    ).eval()
    d = str(tmp_path / "sharded")
    m.save_pretrained(d, safe_serialization=True, max_shard_size="100KB")
    import os

    assert os.path.exists(os.path.join(d, "model.safetensors.index.json")), "not sharded"
    cfg, params = load_model_dir(d, dtype="float32")
    ours = run_prefill_logits_all(cfg, params, TOKENS)
    ref = hf_last_logits(m, TOKENS)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_quantized_load_and_cache(tmp_path):
    """INT8 load-time quantization keeps logits close; the pre-pack cache
    round-trips identically."""
    from transformers import LlamaConfig, LlamaForCausalLM

    m = LlamaForCausalLM(
        LlamaConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=256, vocab_size=300,
        )
    ).eval()
    d = str(tmp_path / "q")
    m.save_pretrained(d, safe_serialization=True)
    cfg, params_fp = load_model_dir(d, dtype="float32")
    ref = run_prefill_logits_all(cfg, params_fp, TOKENS)
    cfg, params_q = load_model_dir(d, dtype="float32", quantization="int8")
    got = run_prefill_logits_all(cfg, params_q, TOKENS)
    # INT8 weight-only should track fp32 closely on a tiny model.
    assert np.abs(got - ref).max() < 0.25
    # Second load hits the sidecar cache and matches exactly.
    import os

    assert os.path.exists(os.path.join(d, ".nv_quant_int8_p2.pkl"))
    cfg, params_q2 = load_model_dir(d, dtype="float32", quantization="int8")
    got2 = run_prefill_logits_all(cfg, params_q2, TOKENS)
    np.testing.assert_array_equal(got, got2)
