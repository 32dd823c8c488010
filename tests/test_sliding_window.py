"""Sliding-window KV recycling: windowed decode must hold O(window) blocks
(not O(context)) while producing exactly the tokens full-table decode
produces (released blocks are behind the mask, so recycling is invisible to
the numerics). VERDICT r1 missing #4."""

import numpy as np

from nanovllm_tpu.config import (
    ActivationType, EngineConfig, ModelConfig, NormType, PositionType,
)
from nanovllm_tpu.engine.llm import LLM
from nanovllm_tpu.sampling_params import SamplingParams

BS = 16
WINDOW = 32


def windowed_cfg():
    return ModelConfig(
        vocab_size=97, hidden_size=48, num_layers=2, num_heads=4, num_kv_heads=2,
        intermediate_size=64, max_seq_len=256, norm_type=NormType.RMSNORM,
        position_type=PositionType.ROPE, activation=ActivationType.SWIGLU,
        sliding_window=WINDOW, dtype="float32", eos_token_id=0,
        model_type="mistral",
    )


def make_llm(recycle: bool, params=None):
    cfg = windowed_cfg()
    ecfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=2, max_model_len=256,
        kv_block_size=BS, max_decode_slots=2, min_prefill_bucket=16,
        num_kv_blocks=24, eos_token_id=0, decode_burst=4,
        enable_prefix_caching=False,
    )
    from nanovllm_tpu.models import model as M

    if params is None:
        params = M.init_params(cfg, seed=9)
    llm = LLM(model_config=cfg, engine_config=ecfg, params=params)
    if not recycle:
        llm.engine.scheduler.sliding_window = 0
    return llm, params


def test_window_recycling_bounds_blocks_and_matches_full_table():
    sp = SamplingParams(temperature=0.0, max_tokens=96, ignore_eos=True)
    prompt = list(range(1, 41))  # 40-token prompt, decodes to 136 > 4x window

    llm_ref, params = make_llm(recycle=False)
    ref = llm_ref.generate([prompt], sp)[0]

    llm, _ = make_llm(recycle=True, params=params)
    eng = llm.engine
    bm = eng.scheduler.block_manager
    sid = eng.add_request(prompt, sp)
    min_free = bm.num_blocks
    max_live_blocks = 0
    out = None
    while not eng.is_finished():
        finished = eng.step()
        seq = eng._seqs.get(sid)
        if seq is not None and seq.block_table:
            live = len(seq.block_table) - seq.num_released_blocks
            max_live_blocks = max(max_live_blocks, live)
            min_free = min(min_free, bm.num_free_blocks)
        for o in finished:
            if o.seq_id == sid:
                out = o
    # Numerics identical: recycling only frees blocks the mask excludes.
    assert out is not None and out.token_ids == ref.token_ids
    # Live blocks bounded by the window (+ burst slack + partial blocks),
    # far below the O(context) 9+ blocks a 136-token table would hold.
    assert max_live_blocks <= WINDOW // BS + 2, max_live_blocks
    # All allocatable blocks returned at the end (block 0 stays reserved).
    assert bm.num_free_blocks == bm.num_blocks - 1


def test_window_recycling_under_block_reuse():
    """Released blocks get adopted and OVERWRITTEN by a second sequence while
    the first is still decoding — outputs must be unaffected."""
    sp = SamplingParams(temperature=0.0, max_tokens=80, ignore_eos=True)
    prompt_a = list(range(1, 41))
    prompt_b = list(range(50, 75))

    llm_ref, params = make_llm(recycle=False)
    ref = llm_ref.generate([prompt_a], sp)[0]

    llm, _ = make_llm(recycle=True, params=params)
    eng = llm.engine
    sid_a = eng.add_request(prompt_a, sp)
    # Step until A has released at least one block, then admit B so it
    # adopts (and overwrites) the recycled blocks.
    for _ in range(40):
        eng.step()
        seq_a = eng._seqs.get(sid_a)
        if seq_a is not None and seq_a.num_released_blocks > 0:
            break
    eng.add_request(prompt_b, SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True))
    outs = {}
    while not eng.is_finished():
        for o in eng.step():
            outs[o.seq_id] = o
    assert outs[sid_a].token_ids == ref.token_ids


def test_release_behind_window_unit():
    from nanovllm_tpu.engine.block_manager import BlockManager
    from nanovllm_tpu.engine.sequence import Sequence

    bm = BlockManager(num_blocks=16, block_size=BS, enable_prefix_caching=False)
    s = Sequence(list(range(5 * BS)), SamplingParams(), BS)
    bm.allocate(s)
    assert bm.num_free_blocks == 10  # 16 - 1 reserved - 5 allocated
    # Window of 32: with len=80, blocks 0..2 end at 48 <= 80-32 = 48.
    n = bm.release_behind_window(s, WINDOW)
    assert n == 3 and s.num_released_blocks == 3
    assert bm.num_free_blocks == 13
    # Idempotent until the sequence grows.
    assert bm.release_behind_window(s, WINDOW) == 0
    for _ in range(BS):
        s.append_token(1)
    assert bm.release_behind_window(s, WINDOW) == 1
    # Deallocate releases only live entries, exactly once.
    bm.deallocate(s)
    assert bm.num_free_blocks == 15


def test_chunked_prefill_with_sliding_window_matches_whole_prompt():
    """Chunked prefill on a windowed model: window recycling must NOT free
    blocks mid-chunk-train (their KV is unwritten and later chunks still
    write/read those positions — ADVICE r4 high #1). Greedy outputs must be
    bit-identical to whole-prompt prefill."""
    from nanovllm_tpu.models import model as M

    cfg = windowed_cfg()
    params = M.init_params(cfg, seed=11)
    prompt = list(range(1, 101))  # 100 tokens: len - window crosses blocks mid-train
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)

    def run(chunk):
        ecfg = EngineConfig(
            max_num_batched_tokens=4096, max_num_seqs=2, max_model_len=256,
            kv_block_size=BS, max_decode_slots=2, min_prefill_bucket=16,
            num_kv_blocks=24, eos_token_id=0, decode_burst=4,
            enable_prefix_caching=False, prefill_chunk_tokens=chunk,
        )
        llm = LLM(model_config=cfg, engine_config=ecfg, params=params)
        eng = llm.engine
        sid = eng.add_request(prompt, sp)
        seq = eng._seqs[sid]
        out = None
        while not eng.is_finished():
            finished = eng.step()
            if seq in eng.scheduler.prefilling:
                # Mid-train: no block may have been recycled yet.
                assert seq.num_released_blocks == 0
            for o in finished:
                out = o
        return out

    ref = run(0)
    out = run(32)
    assert out.token_ids == ref.token_ids
