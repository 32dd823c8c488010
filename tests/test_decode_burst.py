"""Burst-deferred decode (stash + single flush) must reproduce the per-step
decode path exactly: same logits every step, same pool contents after the
flush."""

import numpy as np
import jax.numpy as jnp
import pytest

from nanovllm_tpu.config import ActivationType, ModelConfig, NormType, PositionType, BlockStyle
from nanovllm_tpu.models import model as M
from nanovllm_tpu.ops import kv_cache as kvc

BS = 16


def cfg_of(**kw):
    base = dict(
        vocab_size=97, hidden_size=48, num_layers=2, num_heads=4, num_kv_heads=2,
        intermediate_size=64, max_seq_len=128, norm_type=NormType.RMSNORM,
        position_type=PositionType.ROPE, activation=ActivationType.SWIGLU,
        dtype="float32", eos_token_id=0,
    )
    base.update(kw)
    return ModelConfig(**base)


@pytest.mark.parametrize("quantized,window,style,stash_layout", [
    (False, 0, BlockStyle.SEQUENTIAL, "jbhd"),
    (False, 24, BlockStyle.SEQUENTIAL, "jbhd"),
    (False, 0, BlockStyle.PARALLEL, "jbhd"),
    (True, 0, BlockStyle.SEQUENTIAL, "jbhd"),
    # [L, B, Hkv, J, D] carry (the 128-lane relayout fix) — same numerics.
    (False, 0, BlockStyle.SEQUENTIAL, "bhjd"),
    (False, 24, BlockStyle.SEQUENTIAL, "bhjd"),
    (True, 0, BlockStyle.SEQUENTIAL, "bhjd"),
])
def test_burst_decode_matches_per_step(quantized, window, style, stash_layout):
    cfg = cfg_of(sliding_window=window, block_style=style,
                 num_kv_heads=1 if style == BlockStyle.PARALLEL else 2)
    params = M.init_params(cfg, seed=0)
    rng = np.random.default_rng(5)
    NB = 16
    n_steps = 6
    B = 4
    nb = 4

    def new_pool():
        return kvc.create_kv_pool(
            cfg.num_layers, NB, BS, cfg.num_kv_heads, cfg.head_dim,
            dtype=jnp.float32, quantized=quantized,
        )

    # Three lanes active at different context lengths; lane 1 inactive.
    ctx0 = np.array([20, 1, 33, 7], np.int32)
    active = np.array([True, False, True, True])
    # Disjoint per-lane block tables (the BlockManager invariant).
    perm = rng.permutation(NB)
    block_tables = perm[: B * nb].reshape(B, nb).astype(np.int32)
    # Prefill each active lane's context into both pools identically.
    pool_a, pool_b = new_pool(), new_pool()
    for b in range(B):
        if not active[b]:
            continue
        T = int(ctx0[b]) - 1  # pre-burst context tokens
        if T == 0:
            continue
        toks = rng.integers(1, cfg.vocab_size, T).astype(np.int32)
        sm = kvc.make_slot_mapping(block_tables[b], 0, T, BS, T, NB * BS)
        for pool in (pool_a, pool_b):
            _, pool2, _ = M.prefill_chunk(
                params, cfg, jnp.asarray(toks), jnp.arange(T, dtype=jnp.int32),
                jnp.int32(T), jnp.int32(T), jnp.asarray(block_tables[b]),
                jnp.asarray(sm), pool, None, None, BS,
            )
            pool.update(pool2)

    tokens0 = rng.integers(1, cfg.vocab_size, B).astype(np.int32)
    positions0 = ctx0 - 1
    nslots = NB * BS

    # --- Reference: per-step decode_step with pool writes each step ---
    ref_logits = []
    tok = jnp.asarray(tokens0)
    pos = jnp.asarray(positions0)
    ctx = jnp.asarray(ctx0)
    pool = pool_a
    for i in range(n_steps):
        blk = block_tables[np.arange(B), np.asarray(pos) // BS]
        sm = np.where(active, blk * BS + np.asarray(pos) % BS, nslots).astype(np.int32)
        logits, pool, _ = M.decode_step(
            params, cfg, tok, pos, ctx, jnp.asarray(block_tables),
            jnp.asarray(sm), pool, None, BS,
        )
        ref_logits.append(np.asarray(logits))
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        inc = jnp.asarray(active.astype(np.int32))
        pos = pos + inc
        ctx = ctx + inc

    # --- Burst path: stash + flush, pool untouched during the burst ---
    pool2 = pool_b
    stash = M.create_burst_stash(cfg, n_steps, B, layout=stash_layout)
    tok = jnp.asarray(tokens0)
    pos = jnp.asarray(positions0)
    burst_logits = []
    for i in range(n_steps):
        logits, stash, _ = M.decode_step_burst(
            params, cfg, tok, pos, jnp.asarray(ctx0), jnp.int32(i),
            jnp.asarray(block_tables), pool2, stash, None, BS,
        )
        burst_logits.append(np.asarray(logits))
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pos = pos + jnp.asarray(active.astype(np.int32))
    pool2 = M.flush_burst_stash(
        pool2, cfg, stash, jnp.asarray(block_tables), jnp.asarray(positions0),
        jnp.asarray(active), BS,
    )

    atol = 2e-2 if quantized else 2e-4
    for i in range(n_steps):
        np.testing.assert_allclose(
            burst_logits[i][active], ref_logits[i][active], rtol=atol, atol=atol,
            err_msg=f"step {i}",
        )
    for key in ("k", "v"):
        a = np.asarray(pool2[key], np.float32)
        b = np.asarray(pool[key], np.float32)
        if quantized:
            # Same values quantized through two equivalent compute orders:
            # rounding ties may flip by one int8 step on a handful of cells.
            diff = np.abs(a - b)
            assert diff.max() <= 1.0 and (diff > 0).mean() < 0.005, key
        else:
            np.testing.assert_allclose(a, b, rtol=atol, atol=atol)


def test_pregather_matches_per_layer_gather():
    cfg = cfg_of()
    NB, nb, B = 8, 3, 2
    pool = kvc.create_kv_pool(cfg.num_layers, NB, BS, cfg.num_kv_heads, cfg.head_dim, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    pool["k"] = jnp.asarray(rng.normal(size=pool["k"].shape).astype(np.float32))
    pool["v"] = jnp.asarray(rng.normal(size=pool["v"].shape).astype(np.float32))
    bt = jnp.asarray(rng.integers(0, NB, (B, nb)).astype(np.int32))
    k_all, v_all = M.pregather_context(cfg, pool, bt, BS)
    nslots = NB * BS
    for l in range(cfg.num_layers):
        k, v = kvc.kv_gather(pool, l, nslots, bt, BS, cfg.num_kv_heads, dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(k_all[l]), np.asarray(k))
        np.testing.assert_array_equal(np.asarray(v_all[l]), np.asarray(v))


def test_burst_clamped_to_remaining_budget():
    """clamp_burst_to_budget: when every lane's remaining max_tokens budget
    is below decode_burst, the dispatch runs a shorter (bucketed) burst —
    same outputs, no full-burst device work for tokens postprocess would
    discard (VERDICT r4 weak #7)."""
    from nanovllm_tpu.config import EngineConfig
    from nanovllm_tpu.engine.llm import LLM
    from nanovllm_tpu.sampling_params import SamplingParams

    cfg = cfg_of()
    params = M.init_params(cfg, seed=3)
    prompts = [list(range(1, 20)), list(range(4, 30))]
    sp = SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True)

    def run(clamp):
        ecfg = EngineConfig(
            max_num_batched_tokens=4096, max_num_seqs=4, max_model_len=128,
            kv_block_size=BS, max_decode_slots=4, min_prefill_bucket=16,
            num_kv_blocks=64, eos_token_id=0, decode_burst=8,
            clamp_burst_to_budget=clamp,
        )
        llm = LLM(model_config=cfg, engine_config=ecfg, params=params)
        outs = llm.generate(prompts, sp)
        return outs, list(llm.engine.runner._decode_cache)

    def steps(key):  # decode-cache keys: (nb, n) or ("burst", nb, n, hoist)
        return key[2] if key[0] == "burst" else key[1]

    ref, keys_off = run(False)
    out, keys_on = run(True)
    for a, b in zip(ref, out):
        assert a.token_ids == b.token_ids and len(b.token_ids) == 3
    assert all(steps(k) == 8 for k in keys_off), keys_off
    # Prefill sampled token 1 of 3, so remaining budget is 2 at dispatch.
    assert all(steps(k) == 2 for k in keys_on), keys_on
