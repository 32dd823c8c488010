"""Perplexity evaluation over teacher-forced prefill logits.

New capability relative to the reference (it has no eval harness at all;
its numerical acceptance was a single hard-coded logit check,
cmd/check-logits/main.go:64-69). Used to certify quantization quality:
ΔPPL(int8) ≤ 0.1 and ΔPPL(int4) ≤ 0.5 vs the bf16/fp32 reference
(BASELINE.json).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.config import ModelConfig
from nanovllm_tpu.models import model as M
from nanovllm_tpu.ops import kv_cache as kvc


def sequence_nll(cfg: ModelConfig, params: dict, tokens: list[int], block_size: int = 16):
    """Sum of -log p(token[i+1] | tokens[:i+1]) and count, via one prefill."""
    T = len(tokens)
    nb = (T + block_size - 1) // block_size
    pool = kvc.create_kv_pool(
        cfg.num_layers, nb + 1, block_size, cfg.num_kv_heads, cfg.head_dim,
        dtype=jnp.dtype(cfg.dtype) if cfg.dtype != "float32" else jnp.float32,
    )
    mamba_state = slot = None
    if cfg.is_hybrid:
        from nanovllm_tpu.ops import mamba2 as mo

        mamba_state = mo.create_mamba_state(cfg, 1)
        slot = jnp.int32(0)
    bt = np.arange(nb + 1, dtype=np.int32)
    sm = kvc.make_slot_mapping(bt, 0, T, block_size, T, (nb + 1) * block_size)

    @jax.jit
    def fwd(params, tok, pos, bt_, sm_, pool, mamba_state):
        logits, _, _ = M.prefill_chunk(
            params, cfg, tok, pos, jnp.int32(T), jnp.int32(T), bt_, sm_, pool,
            mamba_state, slot, block_size, all_logits=True,
        )
        logp = jax.nn.log_softmax(logits[:-1].astype(jnp.float32), axis=-1)
        tgt = tok[1:]
        nll = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
        return jnp.sum(nll)

    total = fwd(
        params, jnp.asarray(np.array(tokens, np.int32)), jnp.arange(T, dtype=jnp.int32),
        jnp.asarray(bt), jnp.asarray(sm), pool, mamba_state,
    )
    return float(total), T - 1


def perplexity(cfg: ModelConfig, params: dict, token_seqs: list[list[int]], block_size: int = 16) -> float:
    nll, n = 0.0, 0
    for toks in token_seqs:
        s, c = sequence_nll(cfg, params, toks, block_size)
        nll += s
        n += c
    return math.exp(nll / max(n, 1))


def _window_nll_fn(cfg: ModelConfig, W: int, block_size: int, cache: dict):
    """Jitted NLL over one W-token window with a per-target scoring mask
    (compiled once per window size)."""
    if W in cache:
        return cache[W]

    nb = (W + block_size - 1) // block_size + 1

    @jax.jit
    def fwd(params, tok, score_mask, bt_, sm_, pool, mamba_state):
        slot = jnp.int32(0) if cfg.is_hybrid else None
        logits, _, _ = M.prefill_chunk(
            params, cfg, tok, jnp.arange(W, dtype=jnp.int32),
            jnp.int32(W), jnp.int32(W), bt_, sm_, pool,
            mamba_state, slot, block_size, all_logits=True,
        )
        logp = jax.nn.log_softmax(logits[:-1].astype(jnp.float32), axis=-1)
        tgt = tok[1:]
        nll = -jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
        return jnp.sum(nll * score_mask)

    cache[W] = (fwd, nb)
    return cache[W]


def strided_perplexity(
    cfg: ModelConfig,
    params: dict,
    tokens: list[int],
    window: int = 1024,
    stride: int = 512,
    block_size: int = 16,
) -> float:
    """Sliding-window perplexity over a long corpus (the standard HF
    evaluation protocol): each window of `window` tokens scores only its last
    `stride` targets (the rest are context), so every token past the first
    window is conditioned on >= window - stride tokens of history. This is
    the evaluation the ΔPPL acceptance gates (≤0.1 INT8 / ≤0.5 INT4,
    BASELINE.json) are defined over — single-prefill whole-sequence PPL
    (`perplexity`) caps at max_seq_len and over-weights short-context
    predictions."""
    assert 0 < stride <= window
    n = len(tokens)
    if n <= window:
        s, c = sequence_nll(cfg, params, tokens, block_size)
        return math.exp(s / max(c, 1))

    cache: dict = {}
    fwd, nb = _window_nll_fn(cfg, window, block_size, cache)
    total_nll, total_cnt = 0.0, 0
    prev_end = 0
    start = 0
    while prev_end < n:
        end = min(start + window, n)
        w_tokens = tokens[end - window : end]  # right-aligned full window
        first_scored = max(prev_end, (end - window) + 1)  # absolute pos of first target
        # Targets in the window are positions (end-window)+1 .. end-1.
        mask = np.zeros((window - 1,), np.float32)
        lo = first_scored - (end - window) - 1
        mask[lo:] = 1.0
        n_scored = int(mask.sum())

        pool = kvc.create_kv_pool(
            cfg.num_layers, nb, block_size, cfg.num_kv_heads, cfg.head_dim,
            dtype=jnp.dtype(cfg.dtype) if cfg.dtype != "float32" else jnp.float32,
        )
        mamba_state = None
        if cfg.is_hybrid:
            from nanovllm_tpu.ops import mamba2 as mo

            mamba_state = mo.create_mamba_state(cfg, 1)
        bt = np.arange(nb, dtype=np.int32)
        sm = kvc.make_slot_mapping(bt, 0, window, block_size, window, nb * block_size)
        total_nll += float(
            fwd(
                params, jnp.asarray(np.array(w_tokens, np.int32)),
                jnp.asarray(mask), jnp.asarray(bt), jnp.asarray(sm), pool,
                mamba_state,
            )
        )
        total_cnt += n_scored
        prev_end = end
        start += stride
    return math.exp(total_nll / max(total_cnt, 1))
