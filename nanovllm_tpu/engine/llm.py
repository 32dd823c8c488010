"""LLM facade — the user-facing entry point.

Capability parity with /root/reference/nanovllm/llm.go (NewLLM /
NewLLMWithComponents / GenerateSimple): wires a tokenizer + runner by default
(mock components when no model is given, exactly the reference's default), or
loads a real checkpoint directory and builds the TPU runner.
"""

from __future__ import annotations

from typing import Optional, Sequence as Seq, Union

from nanovllm_tpu.config import EngineConfig, ModelConfig
from nanovllm_tpu.engine.engine import LLMEngine, RequestOutput
from nanovllm_tpu.engine.runner import TPUModelRunner
from nanovllm_tpu.sampling_params import SamplingParams


class LLM:
    def __init__(
        self,
        model: Optional[str] = None,
        engine_config: Optional[EngineConfig] = None,
        model_config: Optional[ModelConfig] = None,
        params: Optional[dict] = None,
        runner=None,
        tokenizer=None,
        **engine_kwargs,
    ):
        """Three construction modes:
          - `model` = checkpoint directory: load config/weights/tokenizer.
          - `model_config` (+ optional `params`): run with given/random weights
            (tests, benchmarks).
          - neither: mock runner + mock tokenizer (engine-only pipelines,
            reference llm.go:9-28).
        """
        ecfg = engine_config or EngineConfig(**engine_kwargs)
        mcfg = model_config

        prebuilt_mesh = None
        params_global = False
        if model is not None:
            from nanovllm_tpu.io.loader import load_model_dir
            from nanovllm_tpu.tokenizer import load_tokenizer

            # Sharded runs load host-side so each device receives only its
            # own shards (no full replicated staging copy in HBM).
            sharded = ecfg.tensor_parallel_size * ecfg.data_parallel_size > 1
            fuse = ecfg.fuse_qkv if ecfg.fuse_qkv is not None else not sharded
            import jax

            if sharded and jax.process_count() > 1:
                # Multi-host: stream-read only THIS process's weight shard
                # (per-host shard loading — io/shard_loader.py); params come
                # back as assembled global jax.Arrays.
                from nanovllm_tpu.io.shard_loader import (
                    assemble_global_params, load_host_shard,
                )
                from nanovllm_tpu.parallel import make_mesh

                prebuilt_mesh = make_mesh(
                    tp_size=ecfg.tensor_parallel_size,
                    dp_size=ecfg.data_parallel_size,
                )
                mcfg, local, lspecs = load_host_shard(
                    model, prebuilt_mesh, quantization=ecfg.quantization
                )
                params = assemble_global_params(local, lspecs, mcfg, prebuilt_mesh)
                params_global = True
            else:
                mcfg, params = load_model_dir(
                    model, quantization=ecfg.quantization, device=not sharded,
                    fuse_qkv=fuse,
                )
            if tokenizer is None:
                tokenizer = load_tokenizer(model)

        if mcfg is not None:
            if ecfg.max_model_len > mcfg.max_seq_len:
                ecfg = ecfg.replace(
                    max_model_len=mcfg.max_seq_len,
                    max_num_batched_tokens=max(
                        mcfg.max_seq_len, min(ecfg.max_num_batched_tokens, 16384)
                    ),
                )
            if mcfg.is_hybrid and ecfg.enable_prefix_caching:
                # Mamba2 state is not block-addressable; prefix reuse would
                # skip state-building prefill compute. Disable for hybrids.
                ecfg = ecfg.replace(enable_prefix_caching=False)
            if mcfg.sliding_window and ecfg.enable_prefix_caching:
                # Window recycling frees blocks behind the window, breaking
                # the chained prefix hashes those blocks anchor.
                ecfg = ecfg.replace(enable_prefix_caching=False)
            if ecfg.eos_token_id < 0:
                ecfg = ecfg.replace(eos_token_id=mcfg.eos_token_ids[0])
            if runner is None:
                # tensor_parallel_size/data_parallel_size are LIVE here: they
                # build the device mesh the runner shards over (the reference
                # carried a TensorParallelSize field that nothing ever read —
                # /root/reference/nanovllm/config.go:15, SURVEY.md §2).
                mesh = prebuilt_mesh
                if mesh is None and ecfg.tensor_parallel_size * ecfg.data_parallel_size > 1:
                    from nanovllm_tpu.parallel import make_mesh

                    mesh = make_mesh(
                        tp_size=ecfg.tensor_parallel_size,
                        dp_size=ecfg.data_parallel_size,
                    )
                runner = TPUModelRunner(
                    mcfg, ecfg, params=params, mesh=mesh, params_global=params_global
                )

        self.engine = LLMEngine(mcfg, ecfg, runner=runner, tokenizer=tokenizer)
        self.model_config = mcfg
        self.engine_config = ecfg

    def generate(
        self,
        prompts: Seq[Union[str, list[int]]],
        sampling_params: Union[SamplingParams, Seq[SamplingParams], None] = None,
    ) -> list[RequestOutput]:
        sp = sampling_params or SamplingParams()
        return self.engine.generate(prompts, sp)

    def generate_simple(self, prompts: Seq[str], max_tokens: int = 64) -> list[str]:
        sp = SamplingParams(temperature=0.0, max_tokens=max_tokens)
        return [o.text for o in self.generate(prompts, sp)]

    def close(self) -> None:
        self.engine.close()
