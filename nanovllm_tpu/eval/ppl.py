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
