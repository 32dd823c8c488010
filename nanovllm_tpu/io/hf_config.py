"""HF config.json → ModelConfig.

Capability parity with /root/reference/purego/tensor/generic_loader.go:807-1007
(field aliasing incl. GPT-2's n_embd/n_layer/n_head, multi_query => 1 KV head,
arch inference from model_type). Supported model types: gpt2, llama, mistral,
falcon, granitemoe, granitemoeshared, granitemoehybrid.
"""

from __future__ import annotations

import json
import os
from typing import Any

from nanovllm_tpu.config import (
    ActivationType,
    BlockStyle,
    LayerKind,
    ModelConfig,
    NormType,
    PositionType,
    RopeScalingConfig,
)

SUPPORTED_MODEL_TYPES = (
    "gpt2",
    "llama",
    "mistral",
    "falcon",
    "granitemoe",
    "granitemoeshared",
    "granitemoehybrid",
)


def _g(d: dict, *names, default=None):
    for n in names:
        if n in d and d[n] is not None:
            return d[n]
    return default


def load_hf_config(model_dir: str) -> dict:
    path = os.path.join(model_dir, "config.json")
    with open(path) as f:
        return json.load(f)


def _eos(raw: Any) -> int | tuple[int, ...]:
    if raw is None:
        return 2
    if isinstance(raw, list):
        return tuple(int(x) for x in raw)
    return int(raw)


def model_config_from_hf(cfg: dict, dtype: str = "bfloat16") -> ModelConfig:
    mt = cfg.get("model_type", "llama")
    if mt not in SUPPORTED_MODEL_TYPES:
        raise ValueError(f"unsupported model_type {mt!r} (supported: {SUPPORTED_MODEL_TYPES})")

    hidden = _g(cfg, "hidden_size", "n_embd")
    layers = _g(cfg, "num_hidden_layers", "n_layer")
    heads = _g(cfg, "num_attention_heads", "n_head")
    kv_heads = _g(cfg, "num_key_value_heads", "num_kv_heads", "n_kv_heads", default=heads)
    if _g(cfg, "multi_query", default=False):
        kv_heads = 1
    vocab = _g(cfg, "vocab_size")
    max_len = _g(cfg, "max_position_embeddings", "n_positions", "n_ctx", default=2048)
    inter = _g(cfg, "intermediate_size", "n_inner", default=0) or 0
    head_dim = _g(cfg, "head_dim", default=0) or 0

    common = dict(
        vocab_size=vocab,
        hidden_size=hidden,
        num_layers=layers,
        num_heads=heads,
        num_kv_heads=kv_heads,
        head_dim=head_dim,
        intermediate_size=inter,
        max_seq_len=max_len,
        norm_eps=_g(cfg, "rms_norm_eps", "layer_norm_epsilon", "layer_norm_eps", default=1e-5),
        rope_theta=_g(cfg, "rope_theta", default=10000.0),
        tie_word_embeddings=_g(cfg, "tie_word_embeddings", default=False),
        eos_token_id=_eos(_g(cfg, "eos_token_id")),
        bos_token_id=_g(cfg, "bos_token_id"),
        dtype=dtype,
        model_type=mt,
    )

    rs = _g(cfg, "rope_scaling")
    if rs and rs.get("rope_type", rs.get("type")) == "llama3":
        common["rope_scaling"] = RopeScalingConfig(
            rope_type="llama3",
            factor=rs.get("factor", 8.0),
            low_freq_factor=rs.get("low_freq_factor", 1.0),
            high_freq_factor=rs.get("high_freq_factor", 4.0),
            original_max_position_embeddings=rs.get("original_max_position_embeddings", 8192),
        )

    if mt == "gpt2":
        return ModelConfig(
            **{**common, "tie_word_embeddings": True},
            norm_type=NormType.LAYERNORM,
            position_type=PositionType.LEARNED,
            activation=ActivationType.GELU,
            block_style=BlockStyle.SEQUENTIAL,
            attn_bias=True,
            mlp_bias=True,
        )

    if mt == "falcon":
        parallel = _g(cfg, "parallel_attn", default=True)
        new_arch = _g(cfg, "new_decoder_architecture", default=False)
        if not new_arch and _g(cfg, "multi_query", default=True):
            common["num_kv_heads"] = 1
        return ModelConfig(
            **common,
            norm_type=NormType.LAYERNORM,
            position_type=PositionType.ROPE,
            activation=ActivationType.GELU,
            block_style=BlockStyle.PARALLEL if (parallel or new_arch) else BlockStyle.SEQUENTIAL,
            # Falcon-40B (new_decoder_architecture) has separate ln_attn/ln_mlp.
            parallel_single_ln=not new_arch,
            attn_bias=_g(cfg, "bias", default=False),
            mlp_bias=_g(cfg, "bias", default=False),
        )

    if mt in ("llama", "mistral"):
        return ModelConfig(
            **common,
            norm_type=NormType.RMSNORM,
            position_type=PositionType.ROPE,
            activation=ActivationType.SWIGLU,
            block_style=BlockStyle.SEQUENTIAL,
            attn_bias=_g(cfg, "attention_bias", default=False),
            mlp_bias=_g(cfg, "mlp_bias", default=False),
            sliding_window=_g(cfg, "sliding_window", default=0) or 0,
        )

    if mt in ("granitemoe", "granitemoeshared"):
        return ModelConfig(
            **common,
            norm_type=NormType.RMSNORM,
            position_type=PositionType.ROPE,
            activation=ActivationType.SWIGLU,
            block_style=BlockStyle.SEQUENTIAL,
            num_experts=_g(cfg, "num_local_experts", default=0),
            num_experts_per_tok=_g(cfg, "num_experts_per_tok", default=0),
            moe_intermediate_size=_g(cfg, "intermediate_size", default=0),
            embedding_multiplier=_g(cfg, "embedding_multiplier", default=1.0),
            residual_multiplier=_g(cfg, "residual_multiplier", default=1.0),
            attention_multiplier=_g(cfg, "attention_multiplier", default=0.0),
            logits_scaling=_g(cfg, "logits_scaling", default=1.0),
        )

    if mt == "granitemoehybrid":
        n_layers = layers
        kinds_raw = _g(cfg, "layer_types", "layers_block_type", default=["mamba"] * n_layers)
        kinds = tuple(
            LayerKind.ATTENTION if k in ("attention", "flash_attention") else LayerKind.MAMBA2
            for k in kinds_raw
        )
        n_experts = _g(cfg, "num_local_experts", default=0)
        return ModelConfig(
            **common,
            norm_type=NormType.RMSNORM,
            position_type=PositionType.ROPE,
            activation=ActivationType.SWIGLU,
            block_style=BlockStyle.SEQUENTIAL,
            layer_kinds=kinds,
            num_experts=n_experts,
            num_experts_per_tok=_g(cfg, "num_experts_per_tok", default=0),
            moe_intermediate_size=_g(cfg, "intermediate_size", default=0),
            embedding_multiplier=_g(cfg, "embedding_multiplier", default=1.0),
            residual_multiplier=_g(cfg, "residual_multiplier", default=1.0),
            attention_multiplier=_g(cfg, "attention_multiplier", default=0.0),
            logits_scaling=_g(cfg, "logits_scaling", default=1.0),
            mamba_d_state=_g(cfg, "mamba_d_state", default=128),
            mamba_d_conv=_g(cfg, "mamba_d_conv", default=4),
            mamba_n_heads=_g(cfg, "mamba_n_heads", default=0),
            mamba_head_dim=_g(cfg, "mamba_d_head", default=0),
            mamba_expand=_g(cfg, "mamba_expand", default=2),
            mamba_n_groups=_g(cfg, "mamba_n_groups", default=1),
            hybrid_attn_rope=_g(cfg, "position_embedding_type", default="nope") == "rope",
        )

    raise AssertionError("unreachable")
