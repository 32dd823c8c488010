"""North-star benchmark: Falcon-7B-Instruct shapes, INT4 weight-only, paged
KV, batched continuous decode on one chip (BASELINE.json: ">50% of roofline
tokens/sec/chip"). Random weights at real shapes (no checkpoint egress);
identical bytes/FLOPs per token as the real model.

Prints one JSON line with the measured decode throughput and the roofline
fraction (roofline = weight-stream bound: weights_bytes / HBM_BW per step,
B tokens per step).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

HBM_GBPS = 819  # v5e


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from nanovllm_tpu.config import ActivationType, BlockStyle, EngineConfig, ModelConfig, NormType, PositionType
    from nanovllm_tpu.engine.llm import LLM
    from nanovllm_tpu.io.loader import quantize_params
    from nanovllm_tpu.models import model as M
    from nanovllm_tpu.sampling_params import SamplingParams

    log(f"backend={jax.default_backend()}")
    cfg = ModelConfig(
        vocab_size=65024,
        hidden_size=4544,
        num_layers=32,
        num_heads=71,
        num_kv_heads=1,
        head_dim=64,
        intermediate_size=18176,
        max_seq_len=2048,
        norm_type=NormType.LAYERNORM,
        position_type=PositionType.ROPE,
        activation=ActivationType.GELU,
        block_style=BlockStyle.PARALLEL,
        tie_word_embeddings=True,
        dtype="bfloat16",
        model_type="falcon",
        eos_token_id=11,
    )
    import os, pickle

    B = int(os.environ.get("FALCON_LANES", "32"))
    PROMPT = int(os.environ.get("FALCON_PROMPT", "128"))
    # Burst 64 amortizes the tunnel round-trip to ~0.45ms/step (r4; with the
    # in-loop-unpack kernels + tiled weight layout this measures 3,784 tok/s
    # = roofline fraction 0.554, closing the BASELINE >0.5 gate. History:
    # burst 8 -> 2,246; burst 32 -> 2,936 @ 0.429 in r3).
    DECODE = int(os.environ.get("FALCON_DECODE", "128"))
    BURST = int(os.environ.get("FALCON_BURST", "64"))

    t0 = time.time()

    # v3: mixed nibble encoding (ops/quant.py quantize_int4)
    cache = "/tmp/nanovllm_bench_falcon7b_int4_v3.pkl"
    if os.path.exists(cache):
        log("loading cached INT4 weights...")
        with open(cache, "rb") as f:
            params_np = pickle.load(f)
    else:
        log("building INT4 weights at Falcon-7B shapes...")
        params_np = quantize_params(M.init_params(cfg, 0, numpy=True), "int4")
        try:
            with open(cache, "wb") as f:
                pickle.dump(params_np, f)
        except OSError:
            pass
    # Post-quantization fusion is exactly equivalent (per-column scales).
    params_np = M.fuse_qkv_params(params_np)
    params = M.to_device_params(params_np, cfg)
    log(f"weights ready in {time.time()-t0:.0f}s")

    ecfg = EngineConfig(
        max_num_batched_tokens=4096,
        max_num_seqs=B,
        max_model_len=512,
        kv_block_size=128,
        kv_pool_bytes=1 << 30,
        max_decode_slots=B,
        min_prefill_bucket=128,
        eos_token_id=cfg.eos_token_ids[0],
        quantization="int4",
        enable_prefix_caching=False,
        decode_burst=BURST,
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
    log(f"warmup {time.time()-t0:.0f}s")
    for k in eng.metrics:
        eng.metrics[k] = 0.0 if isinstance(eng.metrics[k], float) else 0

    log("timed round...")
    for p in prompts:
        eng.add_request(p, sp)
    while not eng.is_finished():
        eng.step()

    m = eng.metrics
    decode_tok_s = m["decode_tokens"] / m["decode_time"] if m["decode_time"] else 0.0
    # Weight-stream roofline, priced at the width each tensor is ACTUALLY
    # streamed at (VERDICT r2 weak #3: the old formula charged the tied
    # lm_head at bf16 while the engine streams it as INT4, inflating the
    # printed fraction ~15%): every matmul weight including the quantized
    # embed^T lm_head reads 0.5 B/param plus fp32 per-group scales
    # (4/INT4_GROUP_SIZE B/param). The embedding gather reads only B rows
    # (negligible).
    from nanovllm_tpu.ops.quant import INT4_GROUP_SIZE

    n_streamed = cfg.num_params_estimate() + cfg.vocab_size * cfg.hidden_size
    wbytes = n_streamed * (0.5 + 4.0 / INT4_GROUP_SIZE)
    step_floor_s = wbytes / (HBM_GBPS * 1e9)
    roofline_tok_s = B / step_floor_s
    log(f"decode: {decode_tok_s:.1f} tok/s | roofline {roofline_tok_s:.0f} tok/s")
    print(
        json.dumps(
            {
                "metric": "falcon-7b int4 batched decode (1 chip)",
                "value": round(decode_tok_s, 2),
                "unit": "tok/s",
                "vs_baseline": round(decode_tok_s / 0.27, 2),  # reference CPU decode
                "roofline_fraction": round(decode_tok_s / roofline_tok_s, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
