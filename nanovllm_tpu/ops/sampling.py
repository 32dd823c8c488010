"""Batched on-device sampling.

Replaces the reference's per-sequence host sampler
(/root/reference/purego/tensor/sampling.go:33-102 — history-weighted
repetition penalty with 3x weight on the last 10 tokens, temperature, softmax,
top-k, top-p, renormalize, multinomial) with one vectorized jitted function
over the whole decode batch. Greedy (temperature == 0) lanes take a plain
argmax — unifying the reference's two disjoint sampling stacks
(SURVEY.md §2.5-3).

Multinomial draws use the Gumbel-max trick (argmax(log p + Gumbel) is an
exact categorical sample) instead of the reference's binary-searched inverse
CDF — branch-free and TPU-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

RECENT_WINDOW = 10  # reference sampling.go:47 — last-10 tokens weigh 3x
RECENT_WEIGHT = 3.0


def apply_repetition_penalty(
    logits: jnp.ndarray,   # [B, V] f32
    history: jnp.ndarray,  # [B, L] int32, padded with >= V (dropped)
    hist_lens: jnp.ndarray,  # [B] int32
    rep_pens: jnp.ndarray,  # [B] f32 (1.0 => no-op)
) -> jnp.ndarray:
    B, V = logits.shape
    L = history.shape[1]
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    recent = (idx >= hist_lens[:, None] - RECENT_WINDOW) & (idx < hist_lens[:, None])
    valid = idx < hist_lens[:, None]
    w = jnp.where(recent, RECENT_WEIGHT, 1.0) * valid.astype(jnp.float32)
    hist_clipped = jnp.where(valid, history, V)  # pad -> OOB, dropped by scatter
    counts = jnp.zeros((B, V), jnp.float32)
    counts = counts.at[jnp.arange(B)[:, None], hist_clipped].add(w, mode="drop")
    active = (rep_pens != 1.0)[:, None]
    pen = rep_pens[:, None] * counts
    penalized = jnp.where(logits > 0, logits / jnp.maximum(pen, 1e-9), logits * pen)
    return jnp.where(active & (counts > 0), penalized, logits)


def sample(
    logits: jnp.ndarray,      # [B, V] f32
    history: jnp.ndarray,     # [B, L] int32
    hist_lens: jnp.ndarray,   # [B] int32
    temperatures: jnp.ndarray,  # [B] f32; 0 => greedy
    top_ks: jnp.ndarray,      # [B] int32; 0 => disabled
    top_ps: jnp.ndarray,      # [B] f32; 1 => disabled
    rep_pens: jnp.ndarray,    # [B] f32; 1 => disabled
    seeds: jnp.ndarray,       # [B] uint32 per-lane stream seeds
    step: jnp.ndarray,        # scalar int32 (decode step counter)
) -> jnp.ndarray:
    B, V = logits.shape
    any_penalty = jnp.any(rep_pens != 1.0)
    logits = jax.lax.cond(
        any_penalty,
        lambda l: apply_repetition_penalty(l, history, hist_lens, rep_pens),
        lambda l: l,
        logits,
    )
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def stochastic(_):
        temp = jnp.maximum(temperatures, 1e-6)[:, None]
        probs = jax.nn.softmax(logits / temp, axis=-1)

        def filtered(probs):
            # Sort once; reuse for both top-k and top-p thresholds.
            sorted_probs = jnp.sort(probs, axis=-1)[:, ::-1]  # descending
            k = jnp.where(top_ks > 0, jnp.minimum(top_ks, V), V)
            kth_val = jnp.take_along_axis(sorted_probs, (k - 1)[:, None], axis=1)
            cumsum = jnp.cumsum(sorted_probs, axis=-1)
            include = cumsum - sorted_probs < top_ps[:, None]  # keep while mass below p
            include = include.at[:, 0].set(True)
            cut_idx = jnp.sum(include.astype(jnp.int32), axis=-1) - 1
            p_cut = jnp.take_along_axis(sorted_probs, cut_idx[:, None], axis=1)
            keep = (probs >= kth_val) & (probs >= p_cut)
            return jnp.where(keep, probs, 0.0)

        need_filter = jnp.any(top_ks > 0) | jnp.any(top_ps < 1.0)
        probs = jax.lax.cond(need_filter, filtered, lambda p: p, probs)

        base = jax.random.PRNGKey(0)
        keys = jax.vmap(lambda s: jax.random.fold_in(jax.random.fold_in(base, s), step))(seeds)
        gumbel = jax.vmap(lambda kk: jax.random.gumbel(kk, (V,), jnp.float32))(keys)
        return jnp.argmax(jnp.log(jnp.maximum(probs, 1e-30)) + gumbel, axis=-1).astype(jnp.int32)

    # Skip softmax/sort/PRNG entirely when every lane is greedy (the CLI and
    # bench default) — the [B, V] sort is the expensive part of sampling.
    all_greedy = jnp.all(temperatures == 0.0)
    sampled = jax.lax.cond(all_greedy, lambda _: greedy_tok, stochastic, None)
    return jnp.where(temperatures == 0.0, greedy_tok, sampled)
