"""Model zoo: generic transformer assembly + per-architecture configs/weight
mappings (GPT-2, Llama 3.x, Granite 3.0 MoE, Falcon MQA, Mistral SWA,
Granite 4.0 hybrid Mamba2)."""

from nanovllm_tpu.models.model import init_params, prefill_chunk, decode_step

__all__ = ["init_params", "prefill_chunk", "decode_step"]
