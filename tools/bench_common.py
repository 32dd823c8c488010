"""Shared setup for the repo-root benches: build a Llama-3.2-1B-shaped
engine with random weights at real shapes (no checkpoint egress in this
environment), INT8 weight-only by default, quantized-weight pickle cache.
"""
from __future__ import annotations

import os
import pickle
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def llama1b_model_config(max_seq_len: int = 4096):
    from nanovllm_tpu.config import (
        ActivationType, ModelConfig, NormType, PositionType, RopeScalingConfig,
    )

    # Llama-3.2-1B architecture (tied embeddings, GQA 32:8, SwiGLU 8192).
    return ModelConfig(
        vocab_size=128256,
        hidden_size=2048,
        num_layers=16,
        num_heads=32,
        num_kv_heads=8,
        head_dim=64,
        intermediate_size=8192,
        max_seq_len=max_seq_len,
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


def llama1b_device_params(cfg, quant: str = "int8"):
    """Random weights at real shapes, quantized, moved to device. Cached in
    /tmp keyed by quant so repeated bench runs skip the 90s init."""
    from nanovllm_tpu.io.loader import quantize_params
    from nanovllm_tpu.models import model as M

    t0 = time.time()
    cache = f"/tmp/nanovllm_bench_llama1b_{quant}_v3.pkl"
    if os.path.exists(cache):
        log("loading cached quantized weights...")
        with open(cache, "rb") as f:
            params_np = pickle.load(f)
    else:
        log("initializing random weights at real shapes...")
        params_np = M.init_params(cfg, seed=0, numpy=True)
        params_np = quantize_params(params_np, quant)
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
    return params


def percentile(values, q: float) -> float:
    """Exact percentile (nearest-rank interpolation) of a list."""
    if not values:
        return 0.0
    return float(np.percentile(np.asarray(values, np.float64), q))
