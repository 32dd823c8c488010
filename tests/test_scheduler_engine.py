"""Scheduler + engine end-to-end with mock runner/tokenizer — the reference's
simple-demo pattern (cmd/simple-demo/main.go, the only model-free exercise of
the full engine stack)."""

import pytest

from nanovllm_tpu.config import EngineConfig
from nanovllm_tpu.engine.engine import LLMEngine, MockTokenizer
from nanovllm_tpu.engine.runner import MockModelRunner
from nanovllm_tpu.engine.scheduler import Scheduler
from nanovllm_tpu.engine.sequence import Sequence, SequenceStatus
from nanovllm_tpu.sampling_params import SamplingParams


def make_engine(**kw):
    cfg = EngineConfig(
        max_num_batched_tokens=4096,
        max_num_seqs=8,
        max_model_len=256,
        kv_block_size=16,
        eos_token_id=0,
        max_decode_slots=8,
        decode_burst=kw.pop("decode_burst", 1),
        **kw,
    )
    return LLMEngine(None, cfg, runner=MockModelRunner(eos_token_id=0, eos_every=10), tokenizer=MockTokenizer(), num_kv_blocks=64)


def test_generate_batch_mock():
    eng = make_engine()
    prompts = [f"hello world {i}" for i in range(5)]
    outs = eng.generate(prompts, SamplingParams(max_tokens=16))
    assert len(outs) == 5
    for o in outs:
        assert o.finish_reason in ("stop", "length")
        assert 1 <= len(o.token_ids) <= 16


def test_outputs_ordered_by_request():
    # Reference bug SURVEY.md §2.5-4: outputs must map to request order.
    eng = make_engine()
    prompts = [[i + 1] * (4 + i) for i in range(6)]
    sps = [SamplingParams(max_tokens=3 + (i % 3) * 5, ignore_eos=True) for i in range(6)]
    outs = eng.generate(prompts, sps)
    for i, o in enumerate(outs):
        assert len(o.token_ids) == sps[i].max_tokens


def test_prefill_priority_and_budget():
    cfg = EngineConfig(
        max_num_batched_tokens=256, max_num_seqs=4, max_model_len=128,
        kv_block_size=16, max_decode_slots=4, decode_burst=1,
    )
    sch = Scheduler(cfg, num_kv_blocks=64)
    for i in range(6):
        sch.add(Sequence([i + 1] * 100, SamplingParams(), 16))
    seqs, is_prefill = sch.schedule()
    assert is_prefill
    assert len(seqs) == 2  # 100+100 <= 256 but 300 > 256
    seqs2, is_prefill2 = sch.schedule()
    assert is_prefill2 and len(seqs2) == 2  # slots/seq budget caps at 4


def test_preemption_requeues_and_finishes():
    # Tiny pool: force decode-time preemption.
    cfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=4, max_model_len=128,
        kv_block_size=16, max_decode_slots=4, decode_burst=1,
    )
    sch = Scheduler(cfg, num_kv_blocks=5)  # 80 tokens total
    a = Sequence([1] * 31, SamplingParams(max_tokens=64, ignore_eos=True), 16)
    b = Sequence([2] * 31, SamplingParams(max_tokens=64, ignore_eos=True), 16)
    sch.add(a)
    sch.add(b)
    seqs, is_prefill = sch.schedule()
    assert is_prefill and len(seqs) == 2  # 2 blocks each, 4 used, 1 free
    # Decode until one gets preempted: each needs a new block at 33 tokens.
    preempted = False
    for step in range(8):
        seqs, is_prefill = sch.schedule()
        if is_prefill:
            preempted = True
            break
        sch.postprocess(seqs, [[5]] * len(seqs))
    # One of the two must have been preempted back to waiting (or already
    # re-admitted via a prefill) once blocks ran out.
    assert preempted or sch.num_waiting() >= 1


def test_engine_metrics_and_cache_accounting():
    eng = make_engine(enable_prefix_caching=True)
    out1 = eng.generate([[7] * 40], SamplingParams(max_tokens=4, ignore_eos=True))
    # Same prompt again: blocks were freed, but hash-table entries survive;
    # freed blocks can be re-adopted (reference block_manager behavior).
    out2 = eng.generate([[7] * 40], SamplingParams(max_tokens=4, ignore_eos=True))
    assert len(out1) == len(out2) == 1
    tp = eng.throughput()
    assert tp["prefill_tokens"] > 0 and tp["decode_tokens"] > 0


def test_add_request_validation():
    eng = make_engine()
    with pytest.raises(ValueError):
        eng.add_request([], SamplingParams())
    with pytest.raises(ValueError):
        eng.add_request([1] * 400, SamplingParams())  # > max_model_len


def test_decode_burst_equivalent_to_single_step():
    """Multi-step bursts must yield the same final outputs as single-step
    decode (mock runner is deterministic in completion position)."""
    def run(burst):
        cfg = EngineConfig(
            max_num_batched_tokens=4096, max_num_seqs=8, max_model_len=256,
            kv_block_size=16, eos_token_id=0, max_decode_slots=8,
            decode_burst=burst,
        )
        eng = LLMEngine(
            None, cfg,
            runner=MockModelRunner(eos_token_id=0, eos_every=10, burst=burst),
            tokenizer=MockTokenizer(), num_kv_blocks=128,
        )
        outs = eng.generate([[i + 1] * 5 for i in range(4)], SamplingParams(max_tokens=17))
        return [o.token_ids for o in outs]

    assert run(1) == run(4)


def test_abort_request():
    eng = make_engine()
    sid1 = eng.add_request([5] * 8, SamplingParams(max_tokens=50, ignore_eos=True))
    sid2 = eng.add_request([6] * 8, SamplingParams(max_tokens=50, ignore_eos=True))
    eng.step()  # prefill both
    free_before = eng.scheduler.block_manager.num_free_blocks
    assert eng.abort_request(sid1)
    assert eng.scheduler.block_manager.num_free_blocks > free_before
    assert not eng.abort_request(sid1)  # already gone
    # remaining request still completes
    while not eng.is_finished():
        eng.step()
    assert sid2 not in eng._seqs


def test_concurrent_add_requests_while_stepping():
    import threading
    import time as _t

    eng = make_engine()
    done = []

    def producer():
        for i in range(12):
            eng.add_request([i + 1] * 6, SamplingParams(max_tokens=5, ignore_eos=True))
            _t.sleep(0.001)
        done.append(True)

    t = threading.Thread(target=producer)
    t.start()
    finished = 0
    deadline = _t.monotonic() + 30
    while _t.monotonic() < deadline:
        finished += len(eng.step())
        if done and eng.is_finished():
            break
    t.join()
    assert finished == 12


def test_abort_while_step_in_flight():
    """Abort landing between dispatch and postprocess (VERDICT r1 weak #9):
    the burst must be discarded, resources released exactly once, and the
    remaining requests unaffected."""
    eng = make_engine(decode_burst=4)
    inner = eng.runner

    class AbortingRunner:
        """Simulates a concurrent abort arriving while runner.run is active."""

        def __init__(self):
            self.abort_target = None

        def run(self, seqs, is_prefill):
            out = inner.run(seqs, is_prefill)
            if not is_prefill and self.abort_target is not None:
                tgt = self.abort_target
                self.abort_target = None
                assert eng.abort_request(tgt)
            return out

        def close(self):
            pass

    wrapper = AbortingRunner()
    eng.runner = wrapper
    sid1 = eng.add_request([5] * 8, SamplingParams(max_tokens=50, ignore_eos=True))
    sid2 = eng.add_request([6] * 8, SamplingParams(max_tokens=50, ignore_eos=True))
    eng.step()  # prefill both
    wrapper.abort_target = sid1
    eng.step()  # decode; abort fires mid-step
    aborted = eng._seqs.get(sid1)
    assert aborted is None  # removed from tracking
    assert sid2 in eng._seqs
    # The aborted sequence's slot and blocks must be free again.
    bm = eng.scheduler.block_manager
    used_by_2 = len(eng._seqs[sid2].block_table)
    assert bm.num_free_blocks == bm.num_blocks - 1 - used_by_2  # -1: reserved block 0
    while not eng.is_finished():
        eng.step()
    assert eng.scheduler.is_finished()


def test_abort_waiting_request_releases_nothing_held():
    eng = make_engine()
    sid = eng.add_request([9] * 8, SamplingParams(max_tokens=10))
    bm = eng.scheduler.block_manager
    assert eng.abort_request(sid)
    assert bm.num_free_blocks == bm.num_blocks - 1  # block 0 reserved
    assert eng.is_finished()


class FlakyRunner(MockModelRunner):
    """Fails the first `n_failures` run() calls, then behaves normally."""

    def __init__(self, n_failures, **kw):
        super().__init__(**kw)
        self.n_failures = n_failures
        self.calls = 0

    def run(self, seqs, is_prefill):
        self.calls += 1
        if self.calls <= self.n_failures:
            raise RuntimeError("injected device failure")
        return super().run(seqs, is_prefill)


def test_step_failure_retries_and_recovers():
    cfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=8, max_model_len=256,
        kv_block_size=16, eos_token_id=0, max_decode_slots=8,
        max_retries_per_request=3,
    )
    eng = LLMEngine(None, cfg, runner=FlakyRunner(2, eos_token_id=0, eos_every=10),
                    tokenizer=MockTokenizer(), num_kv_blocks=64)
    outs = eng.generate(["hello", "world"], SamplingParams(max_tokens=8))
    assert len(outs) == 2
    assert all(o.finish_reason in ("stop", "length") for o in outs)
    assert eng.registry.snapshot().get("step_failures") == 2
    # Blocks/slots all returned.
    assert len(eng.scheduler.free_slots) == 8


def test_retry_exhaustion_finishes_with_error():
    cfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=8, max_model_len=256,
        kv_block_size=16, eos_token_id=0, max_decode_slots=8,
        max_retries_per_request=1, max_consecutive_step_failures=50,
    )
    eng = LLMEngine(None, cfg, runner=FlakyRunner(10**9),
                    tokenizer=MockTokenizer(), num_kv_blocks=64)
    outs = eng.generate(["doomed"], SamplingParams(max_tokens=8))
    assert len(outs) == 1
    assert outs[0].finish_reason == "error"
    assert eng.is_finished()
    assert len(eng.scheduler.free_slots) == 8
    assert eng.scheduler.block_manager.num_free_blocks == 63  # block 0 reserved


def test_consecutive_failures_reraise():
    cfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=8, max_model_len=256,
        kv_block_size=16, eos_token_id=0, max_decode_slots=8,
        max_retries_per_request=10**9, max_consecutive_step_failures=3,
    )
    eng = LLMEngine(None, cfg, runner=FlakyRunner(10**9),
                    tokenizer=MockTokenizer(), num_kv_blocks=64)
    eng.add_request("x", SamplingParams(max_tokens=4))
    with pytest.raises(RuntimeError, match="injected"):
        while not eng.is_finished():
            eng.step()


def test_request_output_ttft_populated():
    """Serving benches (bench_serving.py) compute exact p50/p99 TTFT from
    per-request RequestOutput.ttft_s: every normally-finished request must
    carry a positive arrival->first-token latency."""
    eng = make_engine()
    outs = eng.generate(
        [f"prompt {i}" for i in range(4)], SamplingParams(max_tokens=8)
    )
    assert len(outs) == 4
    for o in outs:
        assert o.ttft_s is not None and o.ttft_s > 0.0
        assert o.ttft_s < 60.0  # sanity: seconds, not a timestamp


def test_ttft_with_staggered_arrivals():
    """Requests added while earlier ones are mid-decode must still get a
    TTFT stamped at their own prefill, measured from their own arrival."""
    eng = make_engine()
    eng.add_request("early request", SamplingParams(max_tokens=30))
    # A few decode steps before the second arrival.
    for _ in range(3):
        eng.step()
    eng.add_request("late arrival", SamplingParams(max_tokens=5))
    outs = []
    while not eng.is_finished():
        outs.extend(eng.step())
    assert len(outs) == 2
    assert all(o.ttft_s is not None and o.ttft_s >= 0.0 for o in outs)
