"""Device sampling semantics (reference tensor/sampling.go:33-102)."""

import numpy as np
import jax.numpy as jnp

from nanovllm_tpu.ops import sampling as S


def run_sample(logits, hist=None, hist_len=0, temp=1.0, top_k=0, top_p=1.0, rep=1.0, seed=0, step=1):
    B, V = logits.shape
    L = 16
    h = np.full((B, L), V, np.int32)
    if hist is not None:
        hist = np.atleast_2d(hist)
        h[:, : hist.shape[1]] = hist
    return np.asarray(
        S.sample(
            jnp.asarray(logits, jnp.float32),
            jnp.asarray(h),
            jnp.full((B,), hist_len, jnp.int32),
            jnp.full((B,), temp, jnp.float32),
            jnp.full((B,), top_k, jnp.int32),
            jnp.full((B,), top_p, jnp.float32),
            jnp.full((B,), rep, jnp.float32),
            jnp.full((B,), seed, jnp.uint32),
            jnp.int32(step),
        )
    )


def test_greedy_is_argmax():
    logits = np.array([[0.1, 5.0, 0.2, 0.3]], np.float32)
    assert run_sample(logits, temp=0.0)[0] == 1


def test_topk_restricts_support():
    rng = np.random.default_rng(0)
    logits = np.array([[10.0, 9.0, -50.0, -50.0, -50.0]] * 4, np.float32)
    for step in range(20):
        toks = run_sample(logits, temp=1.0, top_k=2, seed=step, step=step)
        assert set(toks.tolist()) <= {0, 1}


def test_topp_restricts_support():
    logits = np.array([[10.0, 2.0, 1.0, 0.0]] * 4, np.float32)
    for step in range(10):
        toks = run_sample(logits, temp=1.0, top_p=0.5, seed=step, step=step)
        # p(token0) >> 0.5 => nucleus is {0}
        assert set(toks.tolist()) == {0}


def test_repetition_penalty_discourages_repeats():
    # Token 1 slightly best but heavily repeated in history -> penalized below 0.
    logits = np.array([[1.0, 1.2, -3.0]], np.float32)
    hist = np.array([1, 1, 1, 1], np.int32)
    t = run_sample(logits, hist=hist[None, :], hist_len=4, temp=0.0, rep=1.5)
    assert t[0] == 0


def test_repetition_penalty_weights_recent_3x():
    logits = jnp.asarray(np.zeros((1, 8), np.float32))
    h = np.full((1, 16), 8, np.int32)
    h[0, :2] = [3, 3]
    out = S.apply_repetition_penalty(
        logits + 2.0,
        jnp.asarray(h),
        jnp.asarray([2], jnp.int32),
        jnp.asarray([2.0], jnp.float32),
    )
    # both occurrences recent: count = 3+3 = 6 -> penalty 12 -> 2/12
    np.testing.assert_allclose(np.asarray(out)[0, 3], 2.0 / 12.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[0, 0], 2.0, rtol=1e-6)


def test_negative_logits_multiplied():
    logits = jnp.asarray(np.full((1, 4), -1.0, np.float32))
    h = np.full((1, 16), 4, np.int32)
    h[0, 0] = 2
    out = S.apply_repetition_penalty(
        logits, jnp.asarray(h), jnp.asarray([1], jnp.int32), jnp.asarray([2.0], jnp.float32)
    )
    # count=3 (recent), penalty=6, negative logit multiplied: -1*6
    np.testing.assert_allclose(np.asarray(out)[0, 2], -6.0, rtol=1e-5)
