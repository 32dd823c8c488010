"""Worker for the 2-process per-host shard-loading test: tp=8 spans both
processes (4 devices each), so each process must read/retain only its half
of the checkpoint's sliceable weights."""

import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    ckpt = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
        )

    import numpy as np

    from nanovllm_tpu.config import EngineConfig
    from nanovllm_tpu.engine.llm import LLM
    from nanovllm_tpu.io.shard_loader import (
        assemble_global_params, load_host_shard, process_model_range,
    )
    from nanovllm_tpu.parallel import make_mesh
    from nanovllm_tpu.sampling_params import SamplingParams

    tp = 4 * nproc
    mesh = make_mesh(tp_size=tp, dp_size=1)
    cfg, local, specs = load_host_shard(ckpt, mesh)
    lo, hi, tp_ = process_model_range(mesh)
    print(f"RANGE[{pid}] {(lo, hi, tp_)}", flush=True)

    def nbytes(t):
        import numpy as _np

        total = 0

        def walk(n):
            nonlocal total
            if isinstance(n, dict):
                for v in n.values():
                    walk(v)
            elif isinstance(n, list):
                for v in n:
                    walk(v)
            elif hasattr(n, "nbytes"):
                total += n.nbytes

        walk(t)
        return total

    print(f"LOCALBYTES[{pid}] {nbytes(local)}", flush=True)

    params = assemble_global_params(local, specs, cfg, mesh)
    ecfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=4, max_model_len=64,
        kv_block_size=16, max_decode_slots=4, min_prefill_bucket=16,
        num_kv_blocks=32, eos_token_id=int(1e9), decode_burst=2,
        tensor_parallel_size=tp, data_parallel_size=1,
    )

    class IdTok:
        eos_token_id = int(1e9)

        def encode(self, s):
            return [ord(c) % 50 + 1 for c in s]

        def decode(self, ids):
            return " ".join(map(str, ids))

    from nanovllm_tpu.engine.runner import TPUModelRunner

    with mesh:
        runner = TPUModelRunner(cfg, ecfg, params=params, mesh=mesh, params_global=True)
        llm = LLM(model_config=cfg, engine_config=ecfg, runner=runner, tokenizer=IdTok())
        outs = llm.generate(
            [[3, 4, 5, 6], [9, 10, 11]],
            SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True),
        )
    print(f"TOKENS[{pid}] {[o.token_ids for o in outs]}", flush=True)
    if nproc > 1:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
