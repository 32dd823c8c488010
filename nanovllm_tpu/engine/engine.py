"""LLMEngine: request intake, step loop, batched generation.

Capability parity with /root/reference/nanovllm/llm_engine.go — AddRequest
accepting strings or token ids (:44-54), Step = schedule → run → postprocess →
collect finished (:62-98), Generate loop with prefill/decode throughput
telemetry (:105-182). The reference's output-ordering bug (finished outputs
mapped to prompt indices by first-empty-slot, llm_engine.go:169-181 —
SURVEY.md §2.5-4) is fixed: outputs are keyed by sequence id.
"""

from __future__ import annotations

import logging
import threading
import time
from typing import Optional, Protocol, Sequence as Seq, Union

_logger = logging.getLogger("nanovllm_tpu.engine")

from nanovllm_tpu.config import EngineConfig, ModelConfig
from nanovllm_tpu.utils.metrics import MetricsRegistry, StepLogger
from nanovllm_tpu.engine.runner import ModelRunner, MockModelRunner, default_num_kv_blocks
from nanovllm_tpu.engine.scheduler import Scheduler
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams


class Tokenizer(Protocol):
    def encode(self, text: str) -> list[int]: ...

    def decode(self, token_ids: Seq[int]) -> str: ...

    @property
    def eos_token_id(self) -> int: ...


class MockTokenizer:
    """Char-level fake (reference model_runner.go:86-105)."""

    def encode(self, text: str) -> list[int]:
        return [ord(c) % 256 for c in text]

    def decode(self, token_ids) -> str:
        return "".join(chr(32 + (t % 95)) for t in token_ids)

    @property
    def eos_token_id(self) -> int:
        return 0


class RequestOutput:
    def __init__(self, seq: Sequence, text: str, ttft_s: Optional[float] = None):
        self.seq_id = seq.seq_id
        self.token_ids = list(seq.completion_token_ids)
        self.text = text
        self.finish_reason = seq.finish_reason
        self.num_prompt_tokens = seq.num_prompt_tokens
        self.num_cached_tokens = seq.num_cached_tokens
        # Time-to-first-token (arrival -> end of the prefill step that
        # produced the first token), for serving-latency benches. None for
        # requests that never prefilled (errored/aborted before scheduling).
        self.ttft_s = ttft_s


class LLMEngine:
    def __init__(
        self,
        model_cfg: Optional[ModelConfig],
        engine_cfg: EngineConfig,
        runner: Optional[ModelRunner] = None,
        tokenizer=None,
        num_kv_blocks: Optional[int] = None,
        step_log_path: Optional[str] = None,
    ):
        self.model_cfg = model_cfg
        self.engine_cfg = engine_cfg
        self.runner = runner if runner is not None else MockModelRunner()
        self.tokenizer = tokenizer if tokenizer is not None else MockTokenizer()
        if num_kv_blocks is None:
            if model_cfg is not None:
                num_kv_blocks = default_num_kv_blocks(model_cfg, engine_cfg)
            else:
                num_kv_blocks = 1024  # reference default, scheduler.go:19-21
        eos_ids = model_cfg.eos_token_ids if model_cfg is not None else ()
        self.scheduler = Scheduler(
            engine_cfg, num_kv_blocks, eos_token_ids=eos_ids,
            sliding_window=model_cfg.sliding_window if model_cfg is not None else 0,
        )
        self._seqs: dict[int, Sequence] = {}
        self.metrics = {
            "prefill_tokens": 0,
            "decode_tokens": 0,
            "prefill_time": 0.0,
            "decode_time": 0.0,
            "preemptions": 0,
            "cached_prompt_tokens": 0,
        }
        self.registry = MetricsRegistry()
        self.step_logger = StepLogger(step_log_path)
        self._arrival: dict[int, float] = {}
        self._first_token: dict[int, float] = {}
        # Scheduler state is guarded so requests can stream in from other
        # threads while the step loop runs (the reference's only concurrency
        # guard was a mutex on its KV map, tensor_model_runner.go:13-15).
        self._lock = threading.Lock()
        # Abort-under-load safety: sequences in the currently-dispatched device
        # step must keep their slot/blocks until the step returns, so aborts
        # that land mid-step are deferred and released before postprocess.
        self._inflight_ids: set[int] = set()
        self._deferred_aborts: list[Sequence] = []
        self._consecutive_failures = 0

    # ---- API -------------------------------------------------------------

    def add_request(
        self, prompt: Union[str, list[int]], sampling_params: SamplingParams
    ) -> int:
        token_ids = self.tokenizer.encode(prompt) if isinstance(prompt, str) else list(prompt)
        if not token_ids:
            raise ValueError("empty prompt")
        if len(token_ids) + 1 > self.engine_cfg.max_model_len:
            raise ValueError(
                f"prompt of {len(token_ids)} tokens exceeds max_model_len="
                f"{self.engine_cfg.max_model_len}"
            )
        # Clamp generation at the model limit (vLLM semantics): the request
        # finishes with finish_reason="length" at max_model_len instead of
        # overflowing the block table mid-decode. The caller's params object
        # is never mutated.
        allowed = self.engine_cfg.max_model_len - len(token_ids)
        if sampling_params.max_tokens > allowed:
            import dataclasses

            sampling_params = dataclasses.replace(sampling_params, max_tokens=allowed)
        seq = Sequence(token_ids, sampling_params, self.engine_cfg.kv_block_size)
        with self._lock:
            self.scheduler.add(seq)
            self._seqs[seq.seq_id] = seq
            self._arrival[seq.seq_id] = time.perf_counter()
        self.registry.inc("requests_total")
        return seq.seq_id

    def step(self) -> list[RequestOutput]:
        with self._lock:
            seqs, is_prefill = self.scheduler.schedule()
            self._inflight_ids = {s.seq_id for s in seqs}
        if not seqs:
            return []
        t0 = time.perf_counter()
        lens_before = {s.seq_id: len(s) for s in seqs}
        try:
            token_ids = self.runner.run(seqs, is_prefill)
        except RuntimeError:
            # Only runtime/device errors (jax.errors.JaxRuntimeError is a
            # RuntimeError) enter the retry path; deterministic bugs
            # (shape/tracer/host errors) propagate immediately instead of
            # burning retries and surfacing as per-request errors.
            _logger.exception(
                "device step failed (%s, %d seqs); entering retry path",
                "prefill" if is_prefill else "decode", len(seqs),
            )
            outputs = self._handle_step_failure(seqs)
            if outputs is None:
                raise
            return outputs
        self._consecutive_failures = 0
        dt = time.perf_counter() - t0
        now = time.perf_counter()
        if is_prefill:
            # Tokens computed this step: chunk end minus progress (equals
            # len - num_cached for whole-prompt admission).
            n = sum((s.prefill_target or len(s)) - s.num_prefilled_tokens for s in seqs)
            self.metrics["prefill_tokens"] += n
            self.metrics["prefill_time"] += dt
            # Cache hits are counted once, on a sequence's FIRST chunk.
            self.metrics["cached_prompt_tokens"] += sum(
                s.num_cached_tokens for s in seqs
                if s.num_prefilled_tokens == s.num_cached_tokens
            )
            self.registry.observe("prefill_step_s", dt)
            for s in seqs:
                final_chunk = s.prefill_target is None or s.prefill_target >= len(s)
                if (
                    final_chunk
                    and s.seq_id not in self._first_token
                    and s.seq_id in self._arrival
                ):
                    ttft = now - self._arrival[s.seq_id]
                    self._first_token[s.seq_id] = ttft
                    self.registry.observe("ttft_s", ttft)
        with self._lock:
            self._inflight_ids = set()
            for aborted in self._deferred_aborts:
                self._release_sequence(aborted)
            self._deferred_aborts.clear()
            finished = self.scheduler.postprocess(seqs, token_ids)
        if not is_prefill:
            # Count tokens actually accepted (bursts are trimmed at stop).
            appended = sum(len(s) - lens_before[s.seq_id] for s in seqs)
            self.metrics["decode_tokens"] += appended
            self.metrics["decode_time"] += dt
            self.registry.observe("decode_step_s", dt)
        self.metrics["preemptions"] = self.scheduler.num_preemptions
        self.step_logger.log_step(
            kind="prefill" if is_prefill else "decode",
            num_seqs=len(seqs),
            duration_s=round(dt, 6),
            batched_tokens=(
                n if is_prefill
                else sum(len(s) - lens_before[s.seq_id] for s in seqs)
            ),
            cached_tokens=sum(s.num_cached_tokens for s in seqs) if is_prefill else 0,
            running=self.scheduler.num_running(),
            waiting=self.scheduler.num_waiting(),
            free_blocks=self.scheduler.block_manager.num_free_blocks,
            preemptions=self.scheduler.num_preemptions,
        )
        outputs = []
        for seq in finished:
            text = self.tokenizer.decode(seq.completion_token_ids)
            outputs.append(RequestOutput(seq, text, self._first_token.get(seq.seq_id)))
            del self._seqs[seq.seq_id]
            self._arrival.pop(seq.seq_id, None)
            self._first_token.pop(seq.seq_id, None)
            self.registry.inc("requests_finished")
        return outputs

    def _handle_step_failure(self, seqs: list[Sequence]) -> Optional[list[RequestOutput]]:
        """Request-level retry (SURVEY §5 failure recovery, beyond the
        reference's panic-on-error): a failed device step requeues its
        sequences at the waiting front — they re-prefill on the next step —
        until a sequence exhausts max_retries_per_request (finished with
        finish_reason='error'). Returns the error-finished outputs, or None
        when max_consecutive_step_failures is hit (caller re-raises: the
        failure is the device/program, not a request — donated device
        buffers may be poisoned and a fresh runner is needed)."""
        from nanovllm_tpu.engine.sequence import SequenceStatus

        self._consecutive_failures = getattr(self, "_consecutive_failures", 0) + 1
        self.registry.inc("step_failures")
        if self._consecutive_failures >= self.engine_cfg.max_consecutive_step_failures:
            return None
        outputs = []
        with self._lock:
            self._inflight_ids = set()
            for aborted in self._deferred_aborts:
                self._release_sequence(aborted)
            self._deferred_aborts.clear()
            for seq in seqs:
                if seq.status == SequenceStatus.FINISHED:
                    continue  # aborted while the failing step was in flight
                seq.retries += 1
                if seq in self.scheduler.running:
                    self.scheduler.running.remove(seq)
                if seq in self.scheduler.prefilling:
                    self.scheduler.prefilling.remove(seq)
                if seq.retries > self.engine_cfg.max_retries_per_request:
                    seq.finish_reason = "error"
                    self._release_sequence(seq)
                    # Keep whatever was generated before the failure — the
                    # tokens are in seq.token_ids even though the failing
                    # step's burst never landed.
                    partial = self.tokenizer.decode(seq.completion_token_ids)
                    outputs.append(RequestOutput(seq, partial))
                    self._seqs.pop(seq.seq_id, None)
                    self._arrival.pop(seq.seq_id, None)
                    self._first_token.pop(seq.seq_id, None)
                else:
                    # Reuse the preemption path: deallocate + requeue at the
                    # waiting front; prefill restarts from the prompt.
                    self.scheduler._preempt(seq)
                    self.scheduler.num_preemptions -= 1  # not a capacity preemption
        return outputs

    def _release_sequence(self, seq: Sequence) -> None:
        """Free a sequence's scheduler resources (caller holds the lock)."""
        from nanovllm_tpu.engine.sequence import SequenceStatus

        sch = self.scheduler
        if seq in sch.waiting:
            sch.waiting.remove(seq)
        if seq in sch.running:
            sch.running.remove(seq)
        if seq in sch.prefilling:
            sch.prefilling.remove(seq)
        if seq.block_table:
            sch.block_manager.deallocate(seq)
        if seq.slot is not None:
            sch.free_slots.append(seq.slot)
            seq.slot = None
        seq.status = SequenceStatus.FINISHED

    def abort_request(self, seq_id: int) -> bool:
        """Cancel a request (waiting or running); frees its blocks/slot.
        Returns False if the id is unknown/already finished. Safe to call
        from any thread, including while a device step is in flight — the
        release is deferred until the step returns in that case."""
        from nanovllm_tpu.engine.sequence import SequenceStatus

        with self._lock:
            seq = self._seqs.pop(seq_id, None)
            if seq is None:
                return False
            seq.finish_reason = "aborted"
            if seq.seq_id in self._inflight_ids:
                # Mid-step: mark FINISHED (so postprocess discards the burst,
                # under this same lock) but keep slot/blocks until the step
                # returns — the device program is still writing to them.
                seq.status = SequenceStatus.FINISHED
                self._deferred_aborts.append(seq)
            else:
                self._release_sequence(seq)
        self._arrival.pop(seq_id, None)
        self._first_token.pop(seq_id, None)
        self.registry.inc("requests_aborted")
        return True

    def is_finished(self) -> bool:
        return self.scheduler.is_finished()

    def generate(
        self,
        prompts: Seq[Union[str, list[int]]],
        sampling_params: Union[SamplingParams, Seq[SamplingParams]],
    ) -> list[RequestOutput]:
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * len(prompts)
        ids = [self.add_request(p, sp) for p, sp in zip(prompts, sampling_params)]
        order = {sid: i for i, sid in enumerate(ids)}
        results: list[Optional[RequestOutput]] = [None] * len(prompts)
        while not self.is_finished():
            for out in self.step():
                if out.seq_id in order:
                    results[order[out.seq_id]] = out
        assert all(r is not None for r in results)
        return results  # type: ignore[return-value]

    def throughput(self) -> dict:
        m = self.metrics
        return {
            "prefill_tok_s": m["prefill_tokens"] / m["prefill_time"] if m["prefill_time"] else 0.0,
            "decode_tok_s": m["decode_tokens"] / m["decode_time"] if m["decode_time"] else 0.0,
            **m,
        }

    def stats(self) -> dict:
        """Registry snapshot incl. p50 TTFT and step-time histograms."""
        return {**self.throughput(), **self.registry.snapshot()}

    def close(self) -> None:
        self.step_logger.close()
        self.runner.close()
