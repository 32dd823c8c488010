"""Long-context decode benchmark — showcases the Pallas paged-attention
kernel (the XLA gather fallback's traffic grows with the padded context
bucket; the kernel reads only live pages).

Llama-1B shapes, bf16 weights (so attention traffic, not weight streaming,
dominates), 16 lanes at ~3.5k-token contexts, decode_burst 8.
Prints one JSON line.
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
    from nanovllm_tpu.models import model as M
    from nanovllm_tpu.sampling_params import SamplingParams

    log(f"backend={jax.default_backend()}")
    cfg = ModelConfig(
        vocab_size=128256, hidden_size=2048, num_layers=16, num_heads=32,
        num_kv_heads=8, head_dim=64, intermediate_size=8192, max_seq_len=8192,
        norm_type=NormType.RMSNORM, position_type=PositionType.ROPE,
        activation=ActivationType.SWIGLU, rope_theta=500000.0,
        rope_scaling=RopeScalingConfig(), tie_word_embeddings=True,
        dtype="bfloat16", eos_token_id=128001,
    )
    B, PROMPT, DECODE = 16, 3456, 64

    t0 = time.time()
    log("weights...")
    params = M.init_params(cfg, seed=0)
    log(f"ready {time.time()-t0:.0f}s")
    ecfg = EngineConfig(
        max_num_batched_tokens=65536, max_num_seqs=B, max_model_len=4096,
        kv_block_size=128, kv_pool_bytes=6 << 30, max_decode_slots=B,
        min_prefill_bucket=512, eos_token_id=128001,
        enable_prefix_caching=False,
        # r5: the stash-aware paged kernel lets burst-deferred KV compose
        # with the page walk, so long bursts amortize the ~29ms tunnel RTT:
        # burst 8 -> 1,524 tok/s, 32 -> 2,294, 64 -> 2,440 (r4 ceiling was
        # 1,735 at burst 8 with per-step scatters).
        decode_burst=int(os.environ.get("NANOVLLM_BENCH_BURST", "64")),
        kv_cache_dtype="int8",  # exercises the fused-dequant paged kernel
    )
    llm = LLM(model_config=cfg, engine_config=ecfg, params=params)
    eng = llm.engine
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size, size=PROMPT).tolist() for _ in range(B)]
    sp = SamplingParams(temperature=0.0, max_tokens=DECODE, ignore_eos=True)

    for rnd in ("warmup", "timed"):
        if rnd == "timed":
            for k in eng.metrics:
                eng.metrics[k] = 0.0 if isinstance(eng.metrics[k], float) else 0
        t0 = time.time()
        for p in prompts:
            eng.add_request(p, sp)
        while not eng.is_finished():
            eng.step()
        log(f"{rnd} round {time.time()-t0:.1f}s")

    m = eng.metrics
    decode_tok_s = m["decode_tokens"] / m["decode_time"] if m["decode_time"] else 0.0
    prefill_tok_s = m["prefill_tokens"] / m["prefill_time"] if m["prefill_time"] else 0.0
    log(f"decode@{PROMPT}ctx: {decode_tok_s:.1f} tok/s | prefill: {prefill_tok_s:.1f} tok/s")
    print(json.dumps({
        "metric": f"llama1b bf16-weights int8-KV decode at {PROMPT}-token context (1 chip)",
        "value": round(decode_tok_s, 2),
        "unit": "tok/s",
        "vs_baseline": round(decode_tok_s / 1.7, 2),
        "prefill_tok_s": round(prefill_tok_s, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
