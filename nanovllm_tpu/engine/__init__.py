"""Serving engine: request lifecycle (Sequence), block-granular KV accounting
with prefix caching (BlockManager), continuous-batching scheduler with
preemption (Scheduler), device runners, and the LLMEngine/LLM API."""
