"""Benchmark: Llama-3.2-1B-shaped decode throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference engine's Llama 3.2 1B decode throughput of ~1.7 tok/s
on CPU (BASELINE.md; /root/reference/README.md:144). Weights are random
(no checkpoint egress in this environment) at the real model's exact shapes —
identical FLOPs/bytes per token — INT8 weight-only via the fused Pallas
dequant+matmul kernels, bf16 activations, paged KV, batched continuous
decode at 32 lanes.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from nanovllm_tpu.config import (
        ActivationType, EngineConfig, ModelConfig, NormType, PositionType, RopeScalingConfig,
    )
    from nanovllm_tpu.engine.llm import LLM
    from nanovllm_tpu.io.loader import quantize_params
    from nanovllm_tpu.models import model as M
    from nanovllm_tpu.sampling_params import SamplingParams

    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    # Llama-3.2-1B architecture (tied embeddings, GQA 32:8, SwiGLU 8192).
    cfg = ModelConfig(
        vocab_size=128256,
        hidden_size=2048,
        num_layers=16,
        num_heads=32,
        num_kv_heads=8,
        head_dim=64,
        intermediate_size=8192,
        max_seq_len=4096,
        norm_type=NormType.RMSNORM,
        position_type=PositionType.ROPE,
        activation=ActivationType.SWIGLU,
        rope_theta=500000.0,
        rope_scaling=RopeScalingConfig(),
        tie_word_embeddings=True,
        dtype="bfloat16",
        model_type="llama",
        eos_token_id=128001,
    )
    # 64 lanes: the r1 sub-linear-scaling blocker was the per-step KV scatter;
    # with burst-deferred writes B=64 measures 9,188 tok/s vs B=32's 6,388
    # (B=128 regresses — pregather exceeds the HBM cap and falls per-step).
    B = int(os.environ.get("NANOVLLM_BENCH_LANES", "64"))   # decode lanes
    PROMPT = int(os.environ.get("NANOVLLM_BENCH_PROMPT", "128"))
    DECODE = int(os.environ.get("NANOVLLM_BENCH_DECODE", "64"))

    t0 = time.time()
    rng = np.random.default_rng(0)
    cache = "/tmp/nanovllm_bench_llama1b_int8_v3.pkl"
    import pickle

    if os.path.exists(cache):
        log("loading cached quantized weights...")
        with open(cache, "rb") as f:
            params_np = pickle.load(f)
    else:
        log("initializing random weights at real shapes...")
        params_np = M.init_params(cfg, seed=0, numpy=True)
        params_np = quantize_params(params_np, "int8")
        try:
            with open(cache, "wb") as f:
                pickle.dump(params_np, f)
        except OSError:
            pass
    if os.environ.get("NANOVLLM_BENCH_FUSE", "1") == "1":
        # Post-quantization q/k/v fusion is numerics-identical (per-column
        # scales) — one input-projection dispatch per layer instead of three.
        params_np = M.fuse_qkv_params(params_np)
    params = M.to_device_params(params_np, cfg)
    log(f"weights ready in {time.time()-t0:.1f}s")

    ecfg = EngineConfig(
        max_num_batched_tokens=8192,
        max_num_seqs=B,
        max_model_len=1024,
        kv_block_size=128,
        kv_pool_bytes=2 << 30,
        max_decode_slots=B,
        min_prefill_bucket=128,
        eos_token_id=cfg.eos_token_ids[0],
        quantization="int8",
        decode_burst=16,
        # Identical prompts in warmup+timed rounds: disable prefix caching so
        # the timed prefill measures real compute.
        enable_prefix_caching=False,
    )
    llm = LLM(model_config=cfg, engine_config=ecfg, params=params)
    eng = llm.engine

    prompts = [
        rng.integers(1, cfg.vocab_size, size=PROMPT).tolist() for _ in range(B)
    ]
    sp = SamplingParams(temperature=0.0, max_tokens=DECODE, ignore_eos=True)

    # Warmup round: compiles every prefill/decode bucket shape.
    log("warmup round (compiling)...")
    t0 = time.time()
    for p in prompts:
        eng.add_request(p, sp)
    n_steps = 0
    while not eng.is_finished():
        eng.step()
        n_steps += 1
    log(f"warmup done in {time.time()-t0:.1f}s ({n_steps} steps)")

    # Timed round: identical shapes, zero compiles.
    for k in eng.metrics:
        eng.metrics[k] = 0.0 if isinstance(eng.metrics[k], float) else 0
    log("timed round...")
    t0 = time.time()
    for p in prompts:
        eng.add_request(p, sp)
    n_steps = 0
    while not eng.is_finished():
        eng.step()
        n_steps += 1
    log(f"timed generation done in {time.time()-t0:.1f}s ({n_steps} steps)")

    m = eng.metrics
    decode_tok_s = m["decode_tokens"] / m["decode_time"] if m["decode_time"] else 0.0
    prefill_tok_s = m["prefill_tokens"] / m["prefill_time"] if m["prefill_time"] else 0.0
    log(f"prefill: {m['prefill_tokens']} tok in {m['prefill_time']:.2f}s = {prefill_tok_s:.1f} tok/s")
    log(f"decode:  {m['decode_tokens']} tok in {m['decode_time']:.2f}s = {decode_tok_s:.1f} tok/s")

    baseline = 1.7  # reference Llama-3.2-1B decode tok/s on CPU
    print(
        json.dumps(
            {
                "metric": "llama3.2-1b int8 batched decode throughput (1 chip)",
                "value": round(decode_tok_s, 2),
                "unit": "tok/s",
                "vs_baseline": round(decode_tok_s / baseline, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
