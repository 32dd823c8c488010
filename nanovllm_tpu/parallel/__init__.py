"""Parallelism: device mesh construction and tensor/expert-parallel sharding
specs. New first-class capability relative to the reference, whose only trace
of parallelism is a dead TensorParallelSize config field
(/root/reference/nanovllm/config.go:15; SURVEY.md §2 'Parallelism: NONE')."""

from nanovllm_tpu.parallel.mesh import make_mesh
from nanovllm_tpu.parallel.shardings import shard_params, shard_pool, shard_mamba_state

__all__ = ["make_mesh", "shard_params", "shard_pool", "shard_mamba_state"]
