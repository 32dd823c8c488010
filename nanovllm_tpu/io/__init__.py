"""Checkpoint I/O: HF config.json parsing with field aliasing and arch
inference, safetensors loading (single-file + sharded index), per-architecture
weight mappings with fused-QKV splits, and quantized weight conversion."""
