"""Granite-4.0-hybrid (Mamba2 + attention) through the FULL engine: decode
with per-slot recurrent state must reproduce teacher-forced prefill logits,
and the LLM path must generate deterministically."""

import numpy as np
import jax.numpy as jnp

from nanovllm_tpu.config import (
    ActivationType, EngineConfig, LayerKind, ModelConfig, NormType, PositionType,
)
from nanovllm_tpu.engine.llm import LLM
from nanovllm_tpu.models import model as M
from nanovllm_tpu.ops import kv_cache as kvc
from nanovllm_tpu.ops import mamba2 as mo
from nanovllm_tpu.sampling_params import SamplingParams

BS = 16


def hybrid_cfg():
    return ModelConfig(
        vocab_size=97, hidden_size=48, num_layers=3, num_heads=4, num_kv_heads=2,
        intermediate_size=64, max_seq_len=128,
        norm_type=NormType.RMSNORM, position_type=PositionType.ROPE,
        activation=ActivationType.SWIGLU,
        layer_kinds=(LayerKind.MAMBA2, LayerKind.ATTENTION, LayerKind.MAMBA2),
        mamba_d_state=16, mamba_d_conv=4, mamba_n_heads=4, mamba_head_dim=12,
        mamba_n_groups=1, hybrid_attn_rope=False,
        dtype="float32", eos_token_id=0,
    )


def test_hybrid_decode_matches_prefill():
    cfg = hybrid_cfg()
    params = M.init_params(cfg, seed=2)
    rng = np.random.default_rng(7)
    tokens = rng.integers(1, cfg.vocab_size, size=24).tolist()
    bt = np.array([0, 1], np.int32)

    def prefill(toks, pool, state, slot):
        T = len(toks)
        sm = kvc.make_slot_mapping(bt, 0, T, BS, T, 8 * BS)
        return M.prefill_chunk(
            params, cfg, jnp.asarray(np.array(toks, np.int32)),
            jnp.arange(T, dtype=jnp.int32), jnp.int32(T), jnp.int32(T),
            jnp.asarray(bt), jnp.asarray(sm), pool, state, jnp.int32(slot), BS,
        )

    # Reference: one full prefill of 24 tokens.
    pool = kvc.create_kv_pool(cfg.num_layers, 8, BS, cfg.num_kv_heads, cfg.head_dim, dtype=jnp.float32)
    state = mo.create_mamba_state(cfg, 2)
    ref_logits, _, _ = prefill(tokens, pool, state, 0)

    # Paged path: prefill 20 then 4 teacher-forced decode steps at slot 1.
    pool = kvc.create_kv_pool(cfg.num_layers, 8, BS, cfg.num_kv_heads, cfg.head_dim, dtype=jnp.float32)
    state = mo.create_mamba_state(cfg, 2)
    logits, pool, state = prefill(tokens[:20], pool, state, 1)
    Bn = 2
    for i in range(20, 24):
        tok = np.zeros((Bn,), np.int32)
        pos = np.zeros((Bn,), np.int32)
        ctx = np.ones((Bn,), np.int32)
        bts = np.zeros((Bn, 2), np.int32)
        sm = np.full((Bn,), 8 * BS, np.int32)
        tok[1] = tokens[i]
        pos[1] = i
        ctx[1] = i + 1
        bts[1] = bt
        sm[1] = bt[i // BS] * BS + i % BS
        logits_b, pool, state = M.decode_step(
            params, cfg, jnp.asarray(tok), jnp.asarray(pos), jnp.asarray(ctx),
            jnp.asarray(bts), jnp.asarray(sm), pool, state, BS,
        )
        logits = logits_b[1]
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits), rtol=5e-4, atol=5e-4)


def test_hybrid_llm_end_to_end():
    cfg = hybrid_cfg()
    ecfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=2, max_model_len=128,
        kv_block_size=BS, max_decode_slots=2, min_prefill_bucket=16,
        num_kv_blocks=16, eos_token_id=0, decode_burst=4,
    )
    llm = LLM(model_config=cfg, engine_config=ecfg)
    assert llm.engine_config.enable_prefix_caching is False  # forced for hybrids
    outs = llm.generate([[3, 4, 5, 6], [7, 8, 9]], SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    outs2 = llm.generate([[3, 4, 5, 6], [7, 8, 9]], SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True))
    for a, b in zip(outs, outs2):
        assert a.token_ids == b.token_ids and len(a.token_ids) == 6


def test_hybrid_prefill_batch_matches_per_seq():
    """The batched (group) hybrid prefill — vmapped SSD core + one state
    scatter — must reproduce the per-sequence path exactly: logits AND the
    parked per-slot conv/ssm states (VERDICT r2 next-round #9)."""
    cfg = hybrid_cfg()
    params = M.init_params(cfg, seed=3)
    rng = np.random.default_rng(11)
    T = 16
    lens = [16, 11, 7]
    N = len(lens)
    seq_tokens = [rng.integers(1, cfg.vocab_size, size=l).tolist() for l in lens]
    nb = 2

    def mk_pool():
        return kvc.create_kv_pool(cfg.num_layers, 4 * nb, BS, cfg.num_kv_heads, cfg.head_dim, dtype=jnp.float32)

    # Per-sequence reference.
    pool_r = mk_pool()
    state_r = mo.create_mamba_state(cfg, N)
    ref_logits = []
    for i, toks in enumerate(seq_tokens):
        bt = np.array([2 * i, 2 * i + 1], np.int32)
        sm = kvc.make_slot_mapping(bt, 0, len(toks), BS, T, 4 * nb * BS)
        padded = np.zeros((T,), np.int32)
        padded[: len(toks)] = toks
        lg, pool_r, state_r = M.prefill_chunk(
            params, cfg, jnp.asarray(padded), jnp.arange(T, dtype=jnp.int32),
            jnp.int32(len(toks)), jnp.int32(len(toks)),
            jnp.asarray(bt), jnp.asarray(sm), pool_r, state_r, jnp.int32(i), BS,
        )
        ref_logits.append(np.asarray(lg))

    # Batched group (with one padding row exercising the OOB-slot drop).
    Nb = 4
    pool_b = mk_pool()
    state_b = mo.create_mamba_state(cfg, N)
    tokens = np.zeros((Nb, T), np.int32)
    positions = np.tile(np.arange(T, dtype=np.int32), (Nb, 1))
    valid_lens = np.ones((Nb,), np.int32)
    context_lens = np.ones((Nb,), np.int32)
    block_tables = np.zeros((Nb, nb), np.int32)
    slot_mapping = np.full((Nb, T), 4 * nb * BS, np.int32)
    slot_idxs = np.full((Nb,), N, np.int32)  # OOB for the pad row
    for i, toks in enumerate(seq_tokens):
        tokens[i, : len(toks)] = toks
        valid_lens[i] = context_lens[i] = len(toks)
        block_tables[i] = [2 * i, 2 * i + 1]
        slot_mapping[i] = kvc.make_slot_mapping(block_tables[i], 0, len(toks), BS, T, 4 * nb * BS)
        slot_idxs[i] = i
    logits_b, pool_b, state_b = M.prefill_batch(
        params, cfg, jnp.asarray(tokens), jnp.asarray(positions),
        jnp.asarray(valid_lens), jnp.asarray(context_lens),
        jnp.asarray(block_tables), jnp.asarray(slot_mapping.reshape(-1)),
        pool_b, BS, state_b, jnp.asarray(slot_idxs),
    )
    for i in range(N):
        np.testing.assert_allclose(np.asarray(logits_b[i]), ref_logits[i], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(state_b["ssm"]), np.asarray(state_r["ssm"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(state_b["conv"]), np.asarray(state_r["conv"]), rtol=2e-4, atol=2e-4)
    # KV pools must match too (attention layers of the hybrid stack).
    np.testing.assert_allclose(np.asarray(pool_b["k"]), np.asarray(pool_r["k"]), rtol=2e-4, atol=2e-4)


def test_hybrid_engine_concurrent_arrivals_share_dispatches():
    """Eight same-bucket hybrid admissions must share batched prefill
    dispatches instead of eight per-sequence ones (linear-TTFT fix)."""
    cfg = hybrid_cfg()
    ecfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=8, max_model_len=128,
        kv_block_size=BS, max_decode_slots=8, min_prefill_bucket=16,
        num_kv_blocks=64, eos_token_id=0, decode_burst=4,
    )
    llm = LLM(model_config=cfg, engine_config=ecfg)
    runner = llm.engine.runner
    calls = {"group": 0, "one": 0}
    orig_group, orig_one = runner._prefill_group, runner._prefill_one

    def spy_group(seqs, Tb, nb, nb_force=0):
        calls["group"] += 1
        return orig_group(seqs, Tb, nb, nb_force)

    def spy_one(seq):
        calls["one"] += 1
        return orig_one(seq)

    runner._prefill_group, runner._prefill_one = spy_group, spy_one
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, cfg.vocab_size, size=12).tolist() for _ in range(8)]
    outs = llm.generate(prompts, SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True))
    assert calls["one"] == 0 and 1 <= calls["group"] <= 2
    assert all(len(o.token_ids) == 4 for o in outs)
    # Determinism across a second identical run (fresh engine).
    llm2 = LLM(model_config=cfg, engine_config=ecfg)
    outs2 = llm2.generate(prompts, SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True))
    for a, b in zip(outs, outs2):
        assert a.token_ids == b.token_ids


def test_hybrid_chunked_prefill_matches_whole_prompt():
    """Chunked prefill on a hybrid: each chunk resumes the Mamba scan from
    the state parked by the previous chunk (VERDICT r4 next-step #7) —
    greedy outputs bit-identical to whole-prompt prefill, including with a
    running decode interleaved with the chunk train (whose bursts must NOT
    advance the mid-prefill slot's parked state)."""
    cfg = hybrid_cfg()
    params = M.init_params(cfg, seed=5)
    long_prompt = list(range(1, 81))  # 80 tokens -> 3 chunks of 32
    short_prompt = [7, 8, 9]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    def make(chunk):
        ecfg = EngineConfig(
            max_num_batched_tokens=4096, max_num_seqs=2, max_model_len=128,
            kv_block_size=BS, max_decode_slots=2, min_prefill_bucket=16,
            num_kv_blocks=16, eos_token_id=0, decode_burst=2,
            prefill_chunk_tokens=chunk,
        )
        return LLM(model_config=cfg, engine_config=ecfg, params=params)

    # The facade no longer zeroes chunking for hybrids.
    assert make(32).engine_config.prefill_chunk_tokens == 32

    ref = make(0).generate([long_prompt], sp)[0]
    out = make(32).generate([long_prompt], sp)[0]
    assert out.token_ids == ref.token_ids

    # Interleaved: short request decodes while the long chunk train runs.
    ref_short = make(0).generate([short_prompt], sp)[0]
    llm = make(32)
    eng = llm.engine
    sid_short = eng.add_request(short_prompt, sp)
    eng.step()  # short prefill: decoding from now on
    sid_long = eng.add_request(long_prompt, sp)
    outs = {}
    saw_interleave = False
    while not eng.is_finished():
        long_seq = eng._seqs.get(sid_long)
        if long_seq is not None and long_seq in eng.scheduler.prefilling:
            if eng._seqs.get(sid_short) is not None:
                saw_interleave = True
        for o in eng.step():
            outs[o.seq_id] = o
    assert saw_interleave  # the scenario actually exercised alternation
    assert outs[sid_long].token_ids == ref.token_ids
    assert outs[sid_short].token_ids == ref_short.token_ids
