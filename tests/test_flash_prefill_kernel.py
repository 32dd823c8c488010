"""Pallas flash prefill over the paged pool (interpret mode) vs the XLA
gather + dense masked attention reference."""

import numpy as np
import jax.numpy as jnp

from nanovllm_tpu.ops.attention import attention_chunk_batched
from nanovllm_tpu.ops.pallas import flash_prefill as fp

BS = 16


def run_case(N, T, H, Hkv, D, nb, q_starts, valid_lens, window=0, seed=0):
    """Each sequence n prefills its chunk [q_starts[n], q_starts[n]+valid[n])
    with the prefix already in the pool (chunked-prefill / prefix-cache
    shape). context_len = q_start + valid."""
    rng = np.random.default_rng(seed)
    num_blocks = 16
    slots = num_blocks * BS
    q = rng.standard_normal((N, T, H, D)).astype(np.float32)
    k_pool = rng.standard_normal((slots, Hkv * D)).astype(np.float32)
    v_pool = rng.standard_normal((slots, Hkv * D)).astype(np.float32)
    perm = rng.permutation(num_blocks)
    block_tables = perm[: N * nb].reshape(N, nb).astype(np.int32)
    q_starts = np.array(q_starts, np.int32)
    ctx = q_starts + np.array(valid_lens, np.int32)
    scale = 1.0 / np.sqrt(D)

    fp.set_interpret(True)
    try:
        out_k = fp.flash_prefill_paged(
            jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
            jnp.asarray(block_tables), jnp.asarray(q_starts), jnp.asarray(ctx),
            Hkv, BS, scale, window,
        )
    finally:
        fp.set_interpret(False)

    slots_idx = block_tables[:, :, None] * BS + np.arange(BS)[None, None, :]
    slots_idx = slots_idx.reshape(N, nb * BS)
    k_ctx = k_pool[slots_idx].reshape(N, nb * BS, Hkv, D)
    v_ctx = v_pool[slots_idx].reshape(N, nb * BS, Hkv, D)
    q_positions = q_starts[:, None] + np.arange(T, dtype=np.int32)[None, :]
    ref = attention_chunk_batched(
        jnp.asarray(q), jnp.asarray(k_ctx), jnp.asarray(v_ctx),
        jnp.asarray(q_positions), jnp.arange(nb * BS, dtype=jnp.int32),
        jnp.asarray(ctx), scale, window,
    )
    for n in range(N):
        v = int(valid_lens[n])
        np.testing.assert_allclose(
            np.asarray(out_k)[n, :v], np.asarray(ref)[n, :v],
            rtol=3e-5, atol=3e-5, err_msg=f"seq {n}",
        )


def test_gqa_fresh_prefill():
    run_case(N=2, T=32, H=8, Hkv=2, D=32, nb=4, q_starts=[0, 0], valid_lens=[32, 17])


def test_prefix_cached_chunks():
    # q_start > 0: chunk attends to a pool prefix it did not compute.
    run_case(N=2, T=16, H=4, Hkv=2, D=16, nb=4, q_starts=[24, 5], valid_lens=[16, 11])


def test_mha_and_padded_rows():
    run_case(N=1, T=64, H=4, Hkv=4, D=16, nb=4, q_starts=[0], valid_lens=[40])


def test_mqa_many_groups():
    run_case(N=2, T=16, H=12, Hkv=1, D=16, nb=3, q_starts=[0, 8], valid_lens=[16, 16])


def test_sliding_window_prefill():
    run_case(N=2, T=32, H=4, Hkv=2, D=16, nb=4, q_starts=[16, 0], valid_lens=[32, 30], window=20)


def test_int8_pool_fused_dequant():
    rng = np.random.default_rng(7)
    N, T, H, Hkv, D, nb = 2, 16, 8, 2, 32, 3
    num_blocks = 8
    slots = num_blocks * BS
    q = rng.standard_normal((N, T, H, D)).astype(np.float32)
    k_f = rng.standard_normal((slots, Hkv, D)).astype(np.float32)
    v_f = rng.standard_normal((slots, Hkv, D)).astype(np.float32)
    ks = np.abs(k_f).max(axis=-1) / 127.0 + 1e-8
    vs = np.abs(v_f).max(axis=-1) / 127.0 + 1e-8
    k_q = np.clip(np.rint(k_f / ks[..., None]), -127, 127).astype(np.int8)
    v_q = np.clip(np.rint(v_f / vs[..., None]), -127, 127).astype(np.int8)
    perm = rng.permutation(num_blocks)
    block_tables = perm[: N * nb].reshape(N, nb).astype(np.int32)
    q_starts = np.array([0, 13], np.int32)
    ctx = q_starts + np.array([16, 16], np.int32)
    scale = 1.0 / np.sqrt(D)

    fp.set_interpret(True)
    try:
        out_k = fp.flash_prefill_paged(
            jnp.asarray(q),
            jnp.asarray(k_q.reshape(slots, Hkv * D)),
            jnp.asarray(v_q.reshape(slots, Hkv * D)),
            jnp.asarray(block_tables), jnp.asarray(q_starts), jnp.asarray(ctx),
            Hkv, BS, scale,
            k_scale_l=jnp.asarray(ks.T.copy()),
            v_scale_l=jnp.asarray(vs.T.copy()),
        )
    finally:
        fp.set_interpret(False)

    k_deq = k_q.astype(np.float32) * ks[..., None]
    v_deq = v_q.astype(np.float32) * vs[..., None]
    slots_idx = block_tables[:, :, None] * BS + np.arange(BS)[None, None, :]
    slots_idx = slots_idx.reshape(N, nb * BS)
    q_positions = q_starts[:, None] + np.arange(T, dtype=np.int32)[None, :]
    ref = attention_chunk_batched(
        jnp.asarray(q), jnp.asarray(k_deq[slots_idx]), jnp.asarray(v_deq[slots_idx]),
        jnp.asarray(q_positions), jnp.arange(nb * BS, dtype=jnp.int32),
        jnp.asarray(ctx), scale,
    )
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_prefill_chunk_with_flash_matches_gather():
    """The integrated model dispatch (flash forced on, interpret) must match
    the XLA-gather prefill path exactly — incl. prefix-cached chunk starts."""
    from nanovllm_tpu.config import (
        ActivationType, ModelConfig, NormType, PositionType,
    )
    from nanovllm_tpu.models import model as M
    from nanovllm_tpu.ops import kv_cache as kvc

    cfg = ModelConfig(
        vocab_size=97, hidden_size=48, num_layers=2, num_heads=4, num_kv_heads=2,
        intermediate_size=64, max_seq_len=128, norm_type=NormType.RMSNORM,
        position_type=PositionType.ROPE, activation=ActivationType.SWIGLU,
        dtype="float32", eos_token_id=0,
    )
    params = M.init_params(cfg, seed=0)
    rng = np.random.default_rng(11)
    NB, nb = 8, 4
    pool_a = kvc.create_kv_pool(cfg.num_layers, NB, BS, cfg.num_kv_heads, cfg.head_dim, dtype=jnp.float32)
    pool_b = {k: v for k, v in pool_a.items()}
    block_table = rng.permutation(NB)[:nb].astype(np.int32)

    start, T = 24, 16  # prefix-cached chunk: rows start at position 24
    # First put the prefix in both pools via the gather path.
    pre = rng.integers(1, cfg.vocab_size, start).astype(np.int32)
    sm_pre = kvc.make_slot_mapping(block_table, 0, start, BS, start, NB * BS)
    for pool in (pool_a, pool_b):
        _, p2, _ = M.prefill_chunk(
            params, cfg, jnp.asarray(pre), jnp.arange(start, dtype=jnp.int32),
            jnp.int32(start), jnp.int32(start), jnp.asarray(block_table),
            jnp.asarray(sm_pre), pool, None, None, BS,
        )
        pool.update(p2)

    toks = rng.integers(1, cfg.vocab_size, T).astype(np.int32)
    sm = kvc.make_slot_mapping(block_table, start, T, BS, T, NB * BS)
    args = lambda pool: (
        params, cfg, jnp.asarray(toks),
        jnp.arange(start, start + T, dtype=jnp.int32),
        jnp.int32(T), jnp.int32(start + T), jnp.asarray(block_table),
        jnp.asarray(sm), pool, None, None, BS,
    )
    logits_ref, pool_a, _ = M.prefill_chunk(*args(pool_a))
    fp.set_interpret(True)
    M.set_use_flash_prefill(True)
    try:
        logits_fl, pool_b, _ = M.prefill_chunk(*args(pool_b))
    finally:
        M.set_use_flash_prefill(None)
        fp.set_interpret(False)
    np.testing.assert_allclose(
        np.asarray(logits_fl), np.asarray(logits_ref), rtol=2e-4, atol=2e-4
    )
    for key in ("k", "v"):
        np.testing.assert_allclose(np.asarray(pool_b[key]), np.asarray(pool_a[key]), rtol=1e-5, atol=1e-5)
