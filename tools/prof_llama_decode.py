"""Decompose the headline Llama-1B INT8 decode step (VERDICT r4 #1).

Builds the engine at bench.py's exact default config (64 lanes, burst 32,
INT8 weights, fixed prefill groups), runs the bench warmup round, then:
  1. times individual decode-burst dispatches (wall, incl. tunnel);
  2. captures a jax.profiler trace over two decode bursts;
  3. prints the XLA-op-class anatomy (tools/xprof_summary.op_class_summary).

Env knobs mirror bench.py (NANOVLLM_BENCH_LANES/BURST/PROMPT/DECODE) plus
NANOVLLM_BENCH_KV=int8 to measure the INT8 KV pool variant.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_common import llama1b_device_params, llama1b_model_config, log


def main():
    import jax

    from nanovllm_tpu.config import EngineConfig
    from nanovllm_tpu.engine.llm import LLM
    from nanovllm_tpu.sampling_params import SamplingParams

    cfg = llama1b_model_config()
    B = int(os.environ.get("NANOVLLM_BENCH_LANES", "64"))
    PROMPT = int(os.environ.get("NANOVLLM_BENCH_PROMPT", "128"))
    DECODE = int(os.environ.get("NANOVLLM_BENCH_DECODE", "64"))
    BURST = int(os.environ.get("NANOVLLM_BENCH_BURST", "32"))
    KV = os.environ.get("NANOVLLM_BENCH_KV", "none")

    params = llama1b_device_params(cfg, "int8")
    ecfg = EngineConfig(
        max_num_batched_tokens=8192, max_num_seqs=B, max_model_len=1024,
        kv_block_size=128, kv_pool_bytes=2 << 30, max_decode_slots=B,
        min_prefill_bucket=128, eos_token_id=cfg.eos_token_ids[0],
        quantization="int8", decode_burst=BURST, enable_prefix_caching=False,
        prefill_fixed_groups=True, kv_cache_dtype=KV,
    )
    llm = LLM(model_config=cfg, engine_config=ecfg, params=params)
    eng = llm.engine

    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size, size=PROMPT).tolist() for _ in range(B)]
    sp = SamplingParams(temperature=0.0, max_tokens=DECODE, ignore_eos=True)

    log("warmup round (compiling)...")
    t0 = time.time()
    for p in prompts:
        eng.add_request(p, sp)
    while not eng.is_finished():
        eng.step()
    log(f"warmup done in {time.time()-t0:.1f}s")

    def run_round(trace_dir=None, n_trace_steps=2):
        """One full round; returns list of per-decode-step wall seconds."""
        for p in prompts:
            eng.add_request(p, sp)
        sch = eng.scheduler
        while sch.waiting or sch.prefilling:
            eng.step()  # prefill steps (plus alternated decodes: none here)
        decode_walls = []
        traced = 0
        ctx = None
        while not eng.is_finished():
            if trace_dir is not None and traced == 0:
                ctx = jax.profiler.trace(trace_dir)
                ctx.__enter__()
            t = time.perf_counter()
            eng.step()
            decode_walls.append(time.perf_counter() - t)
            traced += 1
            if ctx is not None and traced == n_trace_steps:
                ctx.__exit__(None, None, None)
                ctx = None
        if ctx is not None:
            ctx.__exit__(None, None, None)
        return decode_walls

    # Wall timing rounds (no trace overhead).
    for r in range(3):
        walls = run_round()
        toks = B * DECODE
        log(f"round {r}: decode bursts {['%.1fms' % (w*1e3) for w in walls]} "
            f"-> {toks/sum(walls):.1f} tok/s")

    trace_dir = os.environ.get("NANOVLLM_TRACE_DIR", "/tmp/nvtrace_llama")
    os.system(f"rm -rf {trace_dir}")
    walls = run_round(trace_dir=trace_dir, n_trace_steps=2)
    log(f"traced round: bursts {['%.1fms' % (w*1e3) for w in walls]}")

    from tools.xprof_summary import load_xspace, op_class_summary

    xs = load_xspace(trace_dir)
    op_class_summary(xs, top_n=30)


if __name__ == "__main__":
    main()
