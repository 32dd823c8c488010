"""Worker process for the 2-process multi-host test (run by
test_multihost.py, one instance per simulated host). Must configure the
backend BEFORE importing jax-dependent modules: CPU platform, 4 virtual
devices per process, jax.distributed over localhost — the recipe from
SURVEY.md §4 'multi-node without a real cluster'."""

import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    from nanovllm_tpu.config import (
        ActivationType, EngineConfig, ModelConfig, NormType, PositionType,
    )
    from nanovllm_tpu.models import model as M
    from nanovllm_tpu.parallel.multihost import MultiHostLLM
    from nanovllm_tpu.sampling_params import SamplingParams

    cfg = ModelConfig(
        vocab_size=211, hidden_size=64, num_layers=2, num_heads=8, num_kv_heads=4,
        intermediate_size=96, max_seq_len=128, norm_type=NormType.RMSNORM,
        position_type=PositionType.ROPE, activation=ActivationType.SWIGLU,
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=48,
        dtype="float32", eos_token_id=0,
    )
    # Identical seed on every host -> identical replicated weights, the same
    # property per-host checkpoint shard loading provides for real models.
    params = M.init_params(cfg, seed=11, numpy=True)
    ecfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=4, max_model_len=128,
        kv_block_size=16, max_decode_slots=4, min_prefill_bucket=16,
        num_kv_blocks=32, eos_token_id=0, decode_burst=2,
        tensor_parallel_size=4, data_parallel_size=nproc,
    )
    mh = MultiHostLLM(model_config=cfg, engine_config=ecfg, params=params)
    prompts = [[3, 4, 5, 6, 7], [9, 10, 11], [21, 22]] if pid == 0 else None
    outs = mh.generate(
        prompts, SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    )
    print(f"TOKENS[{pid}] {[o.token_ids for o in outs]}", flush=True)

    # Idle-step sync overhead: with no new requests, log.sync() must cost one
    # scalar collective (the fast path), not a payload broadcast.
    import time

    n_idle = 50
    t0 = time.perf_counter()
    for _ in range(n_idle):
        tail = mh.log.sync()
        assert tail == []
    dt = (time.perf_counter() - t0) / n_idle
    print(f"IDLESYNC[{pid}] {dt*1e6:.0f}us", flush=True)
    mh.close()
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
