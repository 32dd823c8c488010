"""Trace one bench_zoo family's decode bursts and print the op-class
anatomy (same methodology as tools/prof_llama_decode)."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_common import log


def main():
    import jax

    from bench_zoo import build_params, family_specs
    from nanovllm_tpu.config import EngineConfig
    from nanovllm_tpu.engine.llm import LLM
    from nanovllm_tpu.sampling_params import SamplingParams

    name = sys.argv[1] if len(sys.argv) > 1 else "gpt2"
    spec = family_specs()[name]
    cfg = spec["cfg"]
    B = spec["lanes"]
    params = build_params(name, cfg, spec["quant"])
    ecfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=B,
        max_model_len=spec["max_model_len"], kv_block_size=128,
        kv_pool_bytes=spec["kv_pool"], max_decode_slots=B,
        min_prefill_bucket=128, eos_token_id=cfg.eos_token_ids[0],
        quantization=spec["quant"], decode_burst=spec["burst"],
        enable_prefix_caching=False, prefill_fixed_groups=True,
    )
    llm = LLM(model_config=cfg, engine_config=ecfg, params=params)
    eng = llm.engine
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(1, cfg.vocab_size, size=spec["prompt"]).tolist()
        for _ in range(B)
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=spec["decode"], ignore_eos=True)

    log("warmup...")
    for p in prompts:
        eng.add_request(p, sp)
    while not eng.is_finished():
        eng.step()

    for p in prompts:
        eng.add_request(p, sp)
    sch = eng.scheduler
    while sch.waiting or sch.prefilling:
        eng.step()
    trace_dir = f"/tmp/nvtrace_{name}"
    os.system(f"rm -rf {trace_dir}")
    walls = []
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            t0 = time.perf_counter()
            eng.step()
            walls.append(time.perf_counter() - t0)
    while not eng.is_finished():
        eng.step()
    log(f"traced bursts: {['%.1fms' % (w*1e3) for w in walls]}")

    from tools.xprof_summary import load_xspace, op_class_summary

    op_class_summary(load_xspace(trace_dir), top_n=20)


if __name__ == "__main__":
    main()
