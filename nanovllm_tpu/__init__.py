"""nanovllm_tpu — a TPU-native quantized LLM inference engine.

Brand-new JAX/XLA/Pallas implementation (not a port) with the capabilities of
the reference engine `hashneo/nano-vllm-go` (see SURVEY.md): continuous
batching with prefill-priority scheduling and preemption, block-based paged KV
cache with hash-chained prefix caching (real here: block tables index a
physical on-device KV pool), HF safetensors loading, multi-architecture model
zoo (GPT-2 / Llama 3.x / Granite MoE / Falcon MQA / Mistral SWA / Granite 4.0
hybrid Mamba2), full sampling, plus INT8/INT4 weight-only quantization and
tensor/expert-parallel sharding over a TPU mesh.
"""

from nanovllm_tpu.config import EngineConfig, ModelConfig
from nanovllm_tpu.sampling_params import SamplingParams
from nanovllm_tpu.engine.llm import LLM
from nanovllm_tpu.engine.engine import LLMEngine

__version__ = "0.1.0"

__all__ = [
    "LLM",
    "LLMEngine",
    "EngineConfig",
    "ModelConfig",
    "SamplingParams",
]
