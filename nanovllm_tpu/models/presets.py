"""Per-architecture preset configs.

Capability parity with the reference's preset constructors
(/root/reference/purego/tensor/config.go:125-376 — NewGPT2Config,
NewFalconConfig, NewLlamaConfig, NewGraniteConfig, NewGraniteMoEConfig).
Real checkpoints should load their own config.json (io/hf_config.py); these
are the published architectures for benchmarks and tests.
"""

from __future__ import annotations

from nanovllm_tpu.config import (
    ActivationType,
    BlockStyle,
    LayerKind,
    ModelConfig,
    NormType,
    PositionType,
    RopeScalingConfig,
)


def gpt2_config(variant: str = "small") -> ModelConfig:
    dims = {
        "small": (768, 12, 12),
        "medium": (1024, 24, 16),
        "large": (1280, 36, 20),
        "xl": (1600, 48, 25),
    }[variant]
    e, l, h = dims
    return ModelConfig(
        vocab_size=50257, hidden_size=e, num_layers=l, num_heads=h, num_kv_heads=h,
        intermediate_size=4 * e, max_seq_len=1024,
        norm_type=NormType.LAYERNORM, position_type=PositionType.LEARNED,
        activation=ActivationType.GELU, attn_bias=True, mlp_bias=True,
        tie_word_embeddings=True, model_type="gpt2", eos_token_id=50256,
    )


def llama32_1b_config() -> ModelConfig:
    return ModelConfig(
        vocab_size=128256, hidden_size=2048, num_layers=16, num_heads=32,
        num_kv_heads=8, head_dim=64, intermediate_size=8192, max_seq_len=131072,
        norm_type=NormType.RMSNORM, position_type=PositionType.ROPE,
        activation=ActivationType.SWIGLU, rope_theta=500000.0,
        rope_scaling=RopeScalingConfig(factor=32.0), tie_word_embeddings=True,
        norm_eps=1e-5, model_type="llama", eos_token_id=(128001, 128008, 128009),
        bos_token_id=128000,
    )


def tinyllama_1b_config() -> ModelConfig:
    return ModelConfig(
        vocab_size=32000, hidden_size=2048, num_layers=22, num_heads=32,
        num_kv_heads=4, intermediate_size=5632, max_seq_len=2048,
        norm_type=NormType.RMSNORM, position_type=PositionType.ROPE,
        activation=ActivationType.SWIGLU, model_type="llama", eos_token_id=2,
        bos_token_id=1,
    )


def falcon_7b_config() -> ModelConfig:
    return ModelConfig(
        vocab_size=65024, hidden_size=4544, num_layers=32, num_heads=71,
        num_kv_heads=1, head_dim=64, intermediate_size=18176, max_seq_len=2048,
        norm_type=NormType.LAYERNORM, position_type=PositionType.ROPE,
        activation=ActivationType.GELU, block_style=BlockStyle.PARALLEL,
        tie_word_embeddings=True, model_type="falcon", eos_token_id=11,
    )


def falcon_40b_config() -> ModelConfig:
    return ModelConfig(
        vocab_size=65024, hidden_size=8192, num_layers=60, num_heads=128,
        num_kv_heads=8, head_dim=64, intermediate_size=32768, max_seq_len=2048,
        norm_type=NormType.LAYERNORM, position_type=PositionType.ROPE,
        activation=ActivationType.GELU, block_style=BlockStyle.PARALLEL,
        parallel_single_ln=False, tie_word_embeddings=True,
        model_type="falcon", eos_token_id=11,
    )


def mistral_7b_config() -> ModelConfig:
    return ModelConfig(
        vocab_size=32000, hidden_size=4096, num_layers=32, num_heads=32,
        num_kv_heads=8, intermediate_size=14336, max_seq_len=32768,
        norm_type=NormType.RMSNORM, position_type=PositionType.ROPE,
        activation=ActivationType.SWIGLU, rope_theta=10000.0,
        sliding_window=4096, model_type="mistral", eos_token_id=2, bos_token_id=1,
    )


def granite_moe_1b_config() -> ModelConfig:
    """Granite 3.0 1B-a400m: 32 experts, top-8, muP scaling
    (reference config.go:330-376)."""
    return ModelConfig(
        vocab_size=49155, hidden_size=1024, num_layers=24, num_heads=16,
        num_kv_heads=8, intermediate_size=512, max_seq_len=4096,
        norm_type=NormType.RMSNORM, position_type=PositionType.ROPE,
        activation=ActivationType.SWIGLU,
        num_experts=32, num_experts_per_tok=8, moe_intermediate_size=512,
        # Capacity dispatch stays OPT-IN (factor 0.0 = exact dense combine,
        # matching the reference's exact MoE). The measured crossover
        # (T~1024, tools/ubench_moe.py) makes dispatch ~23-25% faster at
        # large prefills, but real checkpoints routinely route >1.25x the
        # mean load to hot experts and the drop rate has never been measured
        # on non-uniform routing — serving defaults must be lossless. To opt
        # in: set moe_capacity_factor>=1.0 (survivor-renormalized combine,
        # ops/moe.py) and check tools/ubench_moe.py's drop-rate column.
        moe_capacity_factor=0.0,
        embedding_multiplier=12.0, residual_multiplier=0.22,
        attention_multiplier=0.015625, logits_scaling=6.0,
        rope_theta=10000.0, model_type="granitemoe", eos_token_id=0,
    )


def granite4_350m_hybrid_config() -> ModelConfig:
    """Granite 4.0 350M hybrid: Mamba2 layers with attention at 10/13/17/27
    (reference config.go:242-329)."""
    kinds = tuple(
        LayerKind.ATTENTION if i in (10, 13, 17, 27) else LayerKind.MAMBA2
        for i in range(28)
    )
    return ModelConfig(
        vocab_size=49155, hidden_size=768, num_layers=28, num_heads=12,
        num_kv_heads=4, intermediate_size=2048, max_seq_len=32768,
        norm_type=NormType.RMSNORM, position_type=PositionType.ROPE,
        activation=ActivationType.SWIGLU, layer_kinds=kinds,
        mamba_d_state=128, mamba_d_conv=4, mamba_n_heads=24, mamba_head_dim=64,
        mamba_n_groups=1, hybrid_attn_rope=False,
        embedding_multiplier=12.0, residual_multiplier=0.22,
        attention_multiplier=0.015625, logits_scaling=6.0,
        model_type="granitemoehybrid", eos_token_id=0,
    )


PRESETS = {
    "gpt2": gpt2_config,
    "llama-3.2-1b": llama32_1b_config,
    "tinyllama-1.1b": tinyllama_1b_config,
    "falcon-7b": falcon_7b_config,
    "falcon-40b": falcon_40b_config,
    "mistral-7b": mistral_7b_config,
    "granite-moe-1b": granite_moe_1b_config,
    "granite-4.0-350m": granite4_350m_hybrid_config,
}
