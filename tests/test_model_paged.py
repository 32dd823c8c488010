"""Paged-pipeline consistency: decode over the block pool must reproduce the
logits of a single long prefill (teacher-forced), chunked/prefix-cached
prefill must match fresh prefill, and the runner+engine must generate
greedily end-to-end with a real (random-weight) model."""

import numpy as np
import jax.numpy as jnp
import pytest

from nanovllm_tpu.config import EngineConfig, ModelConfig, ActivationType, NormType, PositionType, BlockStyle
from nanovllm_tpu.engine.llm import LLM
from nanovllm_tpu.models import model as M
from nanovllm_tpu.ops import kv_cache as kvc
from nanovllm_tpu.sampling_params import SamplingParams

BS = 16  # kv block size for tests


def tiny_cfg(**kw):
    base = dict(
        vocab_size=97,
        hidden_size=48,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        intermediate_size=64,
        max_seq_len=128,
        norm_type=NormType.RMSNORM,
        position_type=PositionType.ROPE,
        activation=ActivationType.SWIGLU,
        dtype="float32",
        eos_token_id=0,
    )
    base.update(kw)
    return ModelConfig(**base)


def make_pool(cfg, num_blocks=16):
    return kvc.create_kv_pool(
        cfg.num_layers, num_blocks, BS, cfg.num_kv_heads, cfg.head_dim, dtype=jnp.float32
    )


def full_prefill_logits(cfg, params, tokens, pool, block_table):
    T = len(tokens)
    slot_map = kvc.make_slot_mapping(np.array(block_table), 0, T, BS, T, 16 * BS)
    logits, pool, _ = M.prefill_chunk(
        params, cfg,
        jnp.asarray(np.array(tokens, np.int32)),
        jnp.arange(T, dtype=jnp.int32),
        jnp.int32(T), jnp.int32(T),
        jnp.asarray(np.array(block_table, np.int32)),
        jnp.asarray(slot_map),
        pool,
    )
    return logits, pool


@pytest.mark.parametrize("kv_heads,style", [(2, BlockStyle.SEQUENTIAL), (1, BlockStyle.PARALLEL), (4, BlockStyle.SEQUENTIAL)])
def test_decode_matches_prefill(kv_heads, style):
    """Teacher-forced decode over the paged pool == one long prefill."""
    cfg = tiny_cfg(num_kv_heads=kv_heads, block_style=style)
    params = M.init_params(cfg, seed=0)
    rng = np.random.default_rng(5)
    tokens = rng.integers(1, cfg.vocab_size, size=40).tolist()
    bt = [3, 1, 7]  # 3 blocks cover 48 >= 40+decodes

    # Reference: full prefill of all 40 tokens.
    pool = make_pool(cfg)
    ref_logits, _ = full_prefill_logits(cfg, params, tokens, pool, bt)

    # Paged path: prefill 36, then 4 teacher-forced decode steps.
    pool = make_pool(cfg)
    pre = 36
    logits, pool = full_prefill_logits(cfg, params, tokens[:pre], pool, bt)
    B = 4  # decode lanes; lane 2 is ours
    lane = 2
    for i in range(pre, 40):
        tok = np.zeros((B,), np.int32)
        pos = np.zeros((B,), np.int32)
        ctx = np.ones((B,), np.int32)
        bts = np.zeros((B, 3), np.int32)
        sm = np.full((B,), 16 * BS, np.int32)
        tok[lane] = tokens[i]
        pos[lane] = i
        ctx[lane] = i + 1
        bts[lane] = bt
        sm[lane] = bt[i // BS] * BS + i % BS
        logits_b, pool, _ = M.decode_step(
            params, cfg,
            jnp.asarray(tok), jnp.asarray(pos), jnp.asarray(ctx),
            jnp.asarray(bts), jnp.asarray(sm), pool,
        )
        logits = logits_b[lane]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=2e-4, atol=2e-4)


def test_chunked_prefill_with_prefix_matches_fresh():
    """Prefix-cached prefill (skip computed prefix) == full fresh prefill."""
    cfg = tiny_cfg()
    params = M.init_params(cfg, seed=1)
    rng = np.random.default_rng(6)
    tokens = rng.integers(1, cfg.vocab_size, size=2 * BS + 5).tolist()
    bt = [0, 1, 2]

    pool = make_pool(cfg)
    ref_logits, pool = full_prefill_logits(cfg, params, tokens, pool, bt)

    # Same pool now holds KV for the first 2 blocks; re-run only the tail
    # (as after a 2-block prefix-cache hit).
    start = 2 * BS
    tail = tokens[start:]
    Tb = 16  # bucket
    chunk = np.zeros((Tb,), np.int32)
    chunk[: len(tail)] = tail
    slot_map = kvc.make_slot_mapping(np.array(bt), start, len(tail), BS, Tb, 16 * BS)
    logits2, _, _ = M.prefill_chunk(
        params, cfg,
        jnp.asarray(chunk),
        jnp.arange(start, start + Tb, dtype=jnp.int32),
        jnp.int32(len(tail)), jnp.int32(len(tokens)),
        jnp.asarray(np.array(bt, np.int32)),
        jnp.asarray(slot_map),
        pool,
    )
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(ref_logits), rtol=2e-4, atol=2e-4)


def test_llm_end_to_end_greedy_random_model():
    """Full stack: LLM facade -> scheduler -> TPU runner -> paged decode."""
    cfg = tiny_cfg()
    ecfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=4, max_model_len=128,
        kv_block_size=BS, max_decode_slots=4, min_prefill_bucket=16,
        num_kv_blocks=32, eos_token_id=0,
    )
    llm = LLM(model_config=cfg, engine_config=ecfg)
    prompts = [[5, 6, 7, 8], [9, 10, 11], [12, 13, 14, 15, 16]]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    assert all(len(o.token_ids) == 8 for o in outs)
    # Determinism: same prompts again -> same tokens (pure greedy path).
    outs2 = llm.generate(prompts, SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True))
    for a, b in zip(outs, outs2):
        assert a.token_ids == b.token_ids


def test_prefix_cache_skips_compute_but_matches():
    """Engine-level: second identical prompt must reuse cached blocks (fewer
    prefill tokens) AND produce identical greedy output."""
    cfg = tiny_cfg()
    ecfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=4, max_model_len=128,
        kv_block_size=BS, max_decode_slots=4, min_prefill_bucket=16,
        num_kv_blocks=32, eos_token_id=0, enable_prefix_caching=True,
    )
    llm = LLM(model_config=cfg, engine_config=ecfg)
    prompt = list(range(1, 2 * BS + 4))
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    out1 = llm.generate([prompt], sp)[0]
    pre_tokens_1 = llm.engine.metrics["prefill_tokens"]
    out2 = llm.generate([prompt], sp)[0]
    pre_tokens_2 = llm.engine.metrics["prefill_tokens"] - pre_tokens_1
    assert out1.token_ids == out2.token_ids
    assert pre_tokens_2 < pre_tokens_1  # cached prefix skipped compute
    assert llm.engine.metrics["cached_prompt_tokens"] >= 2 * BS


def test_max_model_len_clamps_to_length_finish():
    """A request whose prompt + max_tokens exceeds max_model_len must finish
    cleanly at the limit with finish_reason='length' — not overflow the block
    table and burn retries into finish_reason='error' (VERDICT r2 weak #1;
    repro: prompt 50 + max_tokens 100 @ limit 64 -> completion 14)."""
    cfg = tiny_cfg(max_seq_len=64)
    ecfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=2, max_model_len=64,
        kv_block_size=BS, max_decode_slots=2, min_prefill_bucket=16,
        num_kv_blocks=32, eos_token_id=0, decode_burst=4,
    )
    llm = LLM(model_config=cfg, engine_config=ecfg)
    prompt = list(range(1, 51))  # 50 tokens
    out = llm.generate([prompt], SamplingParams(temperature=0.0, max_tokens=100, ignore_eos=True))[0]
    assert out.finish_reason == "length"
    assert len(out.token_ids) == 14  # capped at max_model_len - prompt
    assert llm.engine.registry.snapshot().get("step_failures", 0) == 0


def test_max_model_len_overflow_does_not_corrupt_neighbor_kv():
    """While one lane hits the model limit mid-burst, a concurrent sequence's
    KV must stay intact: its greedy output must match a solo run (overflowing
    writes used to land in a clamped block id)."""
    cfg = tiny_cfg(max_seq_len=64)

    def make():
        ecfg = EngineConfig(
            max_num_batched_tokens=4096, max_num_seqs=2, max_model_len=64,
            kv_block_size=BS, max_decode_slots=2, min_prefill_bucket=16,
            num_kv_blocks=32, eos_token_id=0, decode_burst=4,
        )
        return LLM(model_config=cfg, engine_config=ecfg)

    probe = [21, 22, 23, 24]
    sp_probe = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    solo = make().generate([probe], sp_probe)[0]
    llm = make()
    outs = llm.generate(
        [list(range(1, 51)), probe],
        [SamplingParams(temperature=0.0, max_tokens=100, ignore_eos=True), sp_probe],
    )
    assert outs[0].finish_reason == "length"
    assert outs[1].token_ids == solo.token_ids


def test_slot_reuse_resets_history():
    """A sequence that finishes mid-burst leaves overshoot tokens in its
    history lane; the next occupant of that slot must see none of them
    (VERDICT r1 weak #5). Output with a 'dirty' slot must equal output from
    a fresh engine."""
    cfg = tiny_cfg()

    def make():
        ecfg = EngineConfig(
            max_num_batched_tokens=4096, max_num_seqs=2, max_model_len=128,
            kv_block_size=BS, max_decode_slots=2, min_prefill_bucket=16,
            num_kv_blocks=32, eos_token_id=0, decode_burst=4,
        )
        return LLM(model_config=cfg, engine_config=ecfg)

    # Repetition penalty makes sampling history-sensitive: any leaked tokens
    # from the previous slot occupant would change the output.
    sp = SamplingParams(
        temperature=0.0, repetition_penalty=1.3, max_tokens=10, ignore_eos=True
    )
    llm = make()
    # First request: max_tokens=10 with burst=4 -> finishes mid-burst (trim).
    first = llm.generate([[5, 6, 7]], sp)[0]
    assert len(first.token_ids) == 10
    # Second request reuses slot 0 (only slot candidates: free list).
    probe = [21, 22, 23, 24]
    dirty = llm.generate([probe], sp)[0]
    fresh = make().generate([probe], sp)[0]
    assert dirty.token_ids == fresh.token_ids


def test_prefill_fixed_groups_one_program_same_outputs():
    """prefill_fixed_groups pads every prefill dispatch (and the sampling
    batch) to one shape per (Tb, nb) bucket — serving-path program-count
    control for devices with small executable caches (r4). Outputs must be
    identical to the default bucketed path."""
    cfg = tiny_cfg()
    params = M.init_params(cfg, seed=41)
    prompts = [[3 + i, 5, 7, 9 + i] for i in range(3)]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    def run(fixed):
        ecfg = EngineConfig(
            max_num_batched_tokens=4096, max_num_seqs=4, max_model_len=128,
            kv_block_size=BS, max_decode_slots=4, min_prefill_bucket=16,
            num_kv_blocks=32, eos_token_id=0, prefill_fixed_groups=fixed,
        )
        from nanovllm_tpu.engine.runner import TPUModelRunner

        runner = TPUModelRunner(cfg, ecfg, params=params)
        llm = LLM(model_config=cfg, engine_config=ecfg, runner=runner)
        outs = []
        # Three rounds with different group sizes: 1, 2, 3 sequences.
        for k in (1, 2, 3):
            outs.extend(llm.generate(prompts[:k], sp))
        return outs, runner

    ref, r_ref = run(False)
    got, r_fix = run(True)
    for a, b in zip(ref, got):
        assert a.token_ids == b.token_ids
    # Fixed groups: exactly one batched-prefill program for the one
    # (Tb, nb) bucket; the default path compiled one per batch bucket.
    fix_keys = [k for k in r_fix._prefill_cache if k and k[0] == "batch"]
    ref_keys = [k for k in r_ref._prefill_cache if k and k[0] == "batch"]
    assert len({k[1] for k in fix_keys}) == 1, fix_keys  # one Nb
    assert len({k[1] for k in ref_keys}) > 1, ref_keys
