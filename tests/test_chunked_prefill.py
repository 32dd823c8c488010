"""Scheduler-level chunked prefill (EngineConfig.prefill_chunk_tokens):
long prompts admit in block-aligned chunks across steps, short requests and
running decodes interleave with the chunk train, and chunked generation is
bit-identical to whole-prompt prefill (VERDICT r3 next-step #3)."""

import numpy as np

from nanovllm_tpu.config import ActivationType, EngineConfig, ModelConfig, NormType, PositionType
from nanovllm_tpu.engine.engine import LLMEngine, MockTokenizer
from nanovllm_tpu.engine.llm import LLM
from nanovllm_tpu.engine.runner import MockModelRunner
from nanovllm_tpu.sampling_params import SamplingParams

BS = 16


def tiny_cfg(**kw):
    base = dict(
        vocab_size=97, hidden_size=48, num_layers=2, num_heads=4,
        num_kv_heads=2, intermediate_size=64, max_seq_len=256,
        norm_type=NormType.RMSNORM, position_type=PositionType.ROPE,
        activation=ActivationType.SWIGLU, dtype="float32", eos_token_id=0,
    )
    base.update(kw)
    return ModelConfig(**base)


def make_mock_engine(chunk=0, **kw):
    cfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=8, max_model_len=512,
        kv_block_size=BS, eos_token_id=0, max_decode_slots=8,
        prefill_chunk_tokens=chunk, **kw,
    )
    return LLMEngine(
        None, cfg, runner=MockModelRunner(eos_token_id=0, eos_every=1000),
        tokenizer=MockTokenizer(), num_kv_blocks=256,
    )


def test_chunked_outputs_match_whole_prompt_mock():
    """Same prompts, chunked vs whole-prompt admission: identical outputs
    (mock runner tokens are keyed off prompt content)."""
    prompts = [list(range(1, 200)), list(range(3, 40)), list(range(5, 9))]
    sp = SamplingParams(max_tokens=12, ignore_eos=True)
    ref = make_mock_engine(chunk=0).generate(prompts, sp)
    out = make_mock_engine(chunk=64).generate(prompts, sp)
    for a, b in zip(ref, out):
        assert a.token_ids == b.token_ids
        assert b.finish_reason == a.finish_reason


def test_long_prompt_admits_in_block_aligned_chunks():
    eng = make_mock_engine(chunk=64)
    eng.add_request(list(range(1, 200)), SamplingParams(max_tokens=4, ignore_eos=True))
    sch = eng.scheduler
    # Step 1: first chunk only (64 of 199 tokens), no token sampled.
    outs = eng.step()
    assert outs == []
    seq = next(iter(eng._seqs.values()))
    assert seq.num_prefilled_tokens == 64
    assert len(sch.prefilling) == 1 and len(sch.running) == 0
    # Chunk ends stay block-aligned until the final chunk.
    eng.step()
    assert seq.num_prefilled_tokens == 128
    eng.step()
    assert seq.num_prefilled_tokens == 192
    eng.step()  # final partial chunk: 192 -> 199, first token sampled
    assert seq.num_prefilled_tokens == 199
    assert len(sch.prefilling) == 0 and len(sch.running) == 1
    assert seq.num_completion_tokens == 1


def test_short_request_admits_alongside_chunk_train():
    """A short prompt arriving mid-chunk-train gets its first token within
    ~one chunk step instead of waiting for the whole long prefill."""
    eng = make_mock_engine(chunk=64)
    eng.add_request(list(range(1, 400)), SamplingParams(max_tokens=4, ignore_eos=True))
    eng.step()  # chunk 1 of the long prompt
    short_id = eng.add_request([7, 8, 9], SamplingParams(max_tokens=4, ignore_eos=True))
    eng.step()  # chunk 2 + short admission in the SAME prefill step
    short = eng._seqs[short_id]
    assert short.num_completion_tokens == 1  # first token after one step
    # Long prompt is still mid-prefill.
    assert len(eng.scheduler.prefilling) == 1


def test_decode_alternates_with_chunk_train():
    """Running decodes must not starve for the whole long prefill: prefill
    and decode steps alternate while a chunk train is in flight."""
    eng = make_mock_engine(chunk=64, decode_burst=1)
    eng.add_request([1, 2, 3], SamplingParams(max_tokens=50, ignore_eos=True))
    eng.step()  # short prefill: now running
    eng.add_request(list(range(1, 400)), SamplingParams(max_tokens=4, ignore_eos=True))
    kinds = []
    for _ in range(8):
        seqs, is_prefill = eng.scheduler.schedule()
        kinds.append("P" if is_prefill else "D")
        eng.scheduler.postprocess(seqs, eng.runner.run(seqs, is_prefill))
    # Strict alternation while both a chunk train and a running decode exist.
    assert "D" in kinds[:2] and "P" in kinds[:2]
    assert kinds[:6] in (["P", "D"] * 3, ["D", "P"] * 3)


def test_chunked_greedy_matches_whole_prompt_real_model():
    """Real tiny model on CPU: chunk-wise KV writes must reproduce the
    whole-prompt prefill bit-for-bit (greedy outputs identical)."""
    cfg = tiny_cfg()
    prompts = [list(range(1, 80)), list(range(2, 50)), [5, 6, 7]]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    def run(chunk):
        ecfg = EngineConfig(
            max_num_batched_tokens=4096, max_num_seqs=4, max_model_len=128,
            kv_block_size=BS, max_decode_slots=4, min_prefill_bucket=16,
            num_kv_blocks=64, eos_token_id=0, prefill_chunk_tokens=chunk,
        )
        llm = LLM(model_config=cfg, engine_config=ecfg)
        return llm.generate(prompts, sp)

    ref = run(0)
    out = run(32)
    for a, b in zip(ref, out):
        assert a.token_ids == b.token_ids


def test_same_step_duplicate_prompt_does_not_hit_pending_blocks():
    """Two identical prompts admitted in the SAME step: the second must not
    claim prefix-cache hits on blocks whose KV hasn't been written yet
    (pending-blocks guard) — and outputs must match a sequential run."""
    cfg = tiny_cfg()
    prompt = list(range(1, 2 * BS + 4))
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    def make():
        ecfg = EngineConfig(
            max_num_batched_tokens=4096, max_num_seqs=4, max_model_len=128,
            kv_block_size=BS, max_decode_slots=4, min_prefill_bucket=16,
            num_kv_blocks=64, eos_token_id=0, enable_prefix_caching=True,
        )
        return LLM(model_config=cfg, engine_config=ecfg)

    # Sequential: second request legitimately reuses the first's blocks.
    llm = make()
    seq_ref = llm.generate([prompt], sp)[0]

    # Concurrent: both admitted in one schedule() call; the duplicate must
    # be treated as a cache MISS (its neighbor's KV isn't computed yet).
    llm2 = make()
    eng = llm2.engine
    eng.add_request(prompt, sp)
    eng.add_request(prompt, sp)
    outs = list(eng.step())  # both admitted in this one prefill step
    cached = [s.num_cached_tokens for s in eng._seqs.values()]
    assert all(c == 0 for c in cached), cached  # duplicate treated as a miss
    while not eng.is_finished():
        outs.extend(eng.step())
    for o in outs:
        assert o.token_ids == seq_ref.token_ids
    # After completion the pending set drains and future hits are safe.
    assert not eng.scheduler.block_manager.pending_blocks
    out3 = llm2.generate([prompt], sp)[0]
    assert out3.num_cached_tokens >= 2 * BS
    assert out3.token_ids == seq_ref.token_ids


def test_preempted_readmitted_chunk_train_completes_before_decode():
    """A preempted-then-readmitted sequence has len(seq) > num_prompt_tokens;
    its chunk train must cover the WHOLE token range (prompt + prior
    completions) before it rejoins decode — promoting on prompt coverage
    alone would decode against KV never written (ADVICE r4 high #2)."""
    prompt = list(range(1, 41))
    sp = SamplingParams(max_tokens=40, ignore_eos=True)
    ref = make_mock_engine(chunk=32, enable_prefix_caching=False).generate(
        [prompt], sp
    )[0]

    eng = make_mock_engine(chunk=32, enable_prefix_caching=False)
    sid = eng.add_request(prompt, sp)
    outs = []
    while eng._seqs[sid].num_completion_tokens < 30:
        outs.extend(eng.step())
    sch = eng.scheduler
    seq = eng._seqs[sid]
    sch.running.remove(seq)
    sch._preempt(seq)  # back to waiting; chunk progress reset
    assert seq.num_prefilled_tokens == 0 and len(seq) == 70

    eng.step()  # readmit: chunk [0, 32)
    assert seq in sch.prefilling and seq.num_prefilled_tokens == 32
    eng.step()  # chunk [32, 64): past num_prompt_tokens=40 but NOT len=70 —
    # the sequence must stay mid-train (the pre-fix bug promoted it here).
    assert seq in sch.prefilling, "promoted to decode with unwritten KV"
    assert seq.num_prefilled_tokens == 64
    eng.step()  # final chunk [64, 70): now decode-eligible
    assert seq not in sch.prefilling and seq in sch.running
    while not eng.is_finished():
        outs.extend(eng.step())
    (out,) = outs
    assert out.token_ids == ref.token_ids
    assert out.finish_reason == ref.finish_reason
