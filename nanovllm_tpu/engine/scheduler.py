"""Continuous-batching scheduler: prefill-priority admission, decode with
preemption-from-back, EOS/max-token termination.

Capability parity with /root/reference/nanovllm/scheduler.go — prefill
admission bounded by token/sequence budgets (:51-67), decode pass with
preemption when blocks run out (:74-100), preempted victims requeued at the
front of the waiting queue (:115-119), postprocess termination rules
(:122-139). Extended for the TPU runner: running sequences additionally hold
a fixed decode-slot lane (bounded by EngineConfig.max_decode_slots) so the
batched decode step keeps a static shape, and stop-token-id sets are honored
(the reference only checks a single EOS).
"""

from __future__ import annotations

from collections import deque

from nanovllm_tpu.config import EngineConfig
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.sequence import Sequence, SequenceStatus


class Scheduler:
    def __init__(
        self, config: EngineConfig, num_kv_blocks: int, eos_token_ids=(),
        sliding_window: int = 0,
    ):
        self.config = config
        # Model's attention window (0 = full attention): enables recycling of
        # KV blocks that fall wholly behind the window during decode.
        self.sliding_window = sliding_window
        self.max_num_seqs = min(config.max_num_seqs, config.max_decode_slots)
        self.max_num_batched_tokens = config.max_num_batched_tokens
        self.eos_token_id = config.eos_token_id
        # Models may define several stop ids (e.g. Llama-3 eot + eos).
        self.eos_token_ids = set(eos_token_ids)
        if config.eos_token_id >= 0:
            self.eos_token_ids.add(config.eos_token_id)
        self.block_manager = BlockManager(
            num_kv_blocks, config.kv_block_size, config.enable_prefix_caching
        )
        self.waiting: deque[Sequence] = deque()
        self.running: deque[Sequence] = deque()
        # Admitted sequences whose prompt is only partially prefilled
        # (chunked prefill, EngineConfig.prefill_chunk_tokens). They hold
        # blocks + a decode slot but are not decode-eligible until their
        # final chunk runs.
        self.prefilling: deque[Sequence] = deque()
        self.prefill_chunk_tokens = config.prefill_chunk_tokens
        self._last_step_prefill = False
        self.num_preemptions = 0
        # Slot handout order. Under data parallelism the decode batch dim is
        # sharded over the mesh 'data' axis in contiguous chunks of
        # S/dp lanes, so slots are dealt round-robin ACROSS replica chunks —
        # K concurrent requests land on min(K, dp) replicas instead of all
        # filling replica 0's chunk first.
        S = config.max_decode_slots
        dp = max(1, config.data_parallel_size)
        if dp > 1 and S % dp == 0:
            chunk = S // dp
            order = [r * chunk + i for i in range(chunk) for r in range(dp)]
        else:
            order = list(range(S))
        self.free_slots: list[int] = list(reversed(order))

    def add(self, seq: Sequence) -> None:
        self.waiting.append(seq)

    def is_finished(self) -> bool:
        return not self.waiting and not self.running and not self.prefilling

    def num_waiting(self) -> int:
        return len(self.waiting)

    def num_running(self) -> int:
        return len(self.running) + len(self.prefilling)

    def _chunk_end(self, seq: Sequence, tokens_used: int) -> int | None:
        """End offset of this step's prefill chunk for `seq`, or None if no
        budget. Non-final chunk ends align down to kv_block_size so every
        mid-prompt resume sits on the block-aligned path prefix caching
        already exercises."""
        cap = self.prefill_chunk_tokens
        progress = seq.num_prefilled_tokens
        remaining = len(seq) - progress
        budget_left = self.max_num_batched_tokens - tokens_used
        take = min(remaining, cap) if cap else remaining
        take = min(take, budget_left)
        if take <= 0:
            return None
        end = progress + take
        if end < len(seq):
            if not cap:
                return None  # whole-prompt mode never splits
            end_aligned = (end // self.config.kv_block_size) * self.config.kv_block_size
            if end_aligned <= progress:
                return None
            end = end_aligned
        return end

    def schedule(self) -> tuple[list[Sequence], bool]:
        """Returns (sequences, is_prefill). Prefill-first: continue in-flight
        chunked prefills, then admit waiting sequences while budgets hold;
        otherwise run one decode step over the running set (preempting from
        the back if blocks are exhausted). When a chunk train and running
        decodes coexist, prefill and decode steps ALTERNATE so a long prompt
        doesn't stall every running sequence for its whole prefill."""
        if self.prefilling and self.running and self._last_step_prefill:
            decode = self._schedule_decode()
            if decode:
                self._last_step_prefill = False
                return decode, False
        # --- Prefill branch ---
        scheduled: list[Sequence] = []
        num_batched_tokens = 0
        # 1. Continue mid-prefill chunk trains (they already hold blocks + a
        # slot; finishing them first frees capacity soonest).
        for seq in list(self.prefilling):
            if num_batched_tokens >= self.max_num_batched_tokens:
                break
            end = self._chunk_end(seq, num_batched_tokens)
            if end is None:
                continue
            seq.prefill_target = end
            num_batched_tokens += end - seq.num_prefilled_tokens
            scheduled.append(seq)
        # 2. Admit new sequences (short prompts land alongside a chunk train,
        # bounding their TTFT at ~one chunk step).
        admitted: list[Sequence] = []
        while (
            self.waiting
            and len(self.running) + len(self.prefilling) + len(admitted) < self.max_num_seqs
        ):
            seq = self.waiting[0]
            # Worst-case new tokens this step (cache hits discovered at
            # allocate): the first chunk under chunking, the prompt otherwise.
            cap = self.prefill_chunk_tokens
            first_chunk = min(len(seq), cap) if cap else len(seq)
            if num_batched_tokens + first_chunk > self.max_num_batched_tokens:
                break
            if not self.block_manager.can_allocate(seq) or not self.free_slots:
                break
            self.waiting.popleft()
            self.block_manager.allocate(seq)
            seq.num_cached_tokens = min(seq.num_cached_tokens, len(seq) - 1)
            seq.num_prefilled_tokens = seq.num_cached_tokens
            seq.slot = self.free_slots.pop()
            seq.status = SequenceStatus.RUNNING
            end = self._chunk_end(seq, num_batched_tokens)
            seq.prefill_target = end if end is not None else len(seq)
            num_batched_tokens += seq.prefill_target - seq.num_prefilled_tokens
            admitted.append(seq)
            scheduled.append(seq)
        for seq in admitted:
            if seq.prefill_target < len(seq):
                self.prefilling.append(seq)
            else:
                self.running.append(seq)
        if scheduled:
            self._last_step_prefill = True
            return scheduled, True

        decode = self._schedule_decode()
        self._last_step_prefill = False
        return decode, False

    def _schedule_decode(self) -> list[Sequence]:
        # --- Decode branch (multi-step burst): every scheduled sequence gets
        # block capacity for `decode_burst` appended tokens up front ---
        burst = self.config.decode_burst
        decode: list[Sequence] = []
        n = len(self.running)
        for _ in range(n):
            if not self.running:
                break
            seq = self.running.popleft()
            # Never allocate blocks past the model limit: generation is
            # clamped at max_model_len (add_request caps max_tokens; the
            # device step masks KV writes past the limit), so capacity is
            # only needed for the tokens that can actually be kept.
            need = min(burst, max(1, self.config.max_model_len - len(seq)))
            preempted_self = False
            while not self.block_manager.can_ensure(seq, need):
                if self.running:
                    self._preempt(self.running.pop())
                else:
                    self._preempt(seq)
                    preempted_self = True
                    break
            if preempted_self:
                continue
            self.block_manager.ensure_capacity(seq, need)
            decode.append(seq)
        self.running.extend(decode)
        if not decode and self.waiting and not self.running and not self.prefilling:
            # Prefill already failed this call with every resource free: the
            # head sequence can never be admitted (pool too small). The
            # reference panics here too (scheduler.go:103).
            seq = self.waiting[0]
            raise RuntimeError(
                f"unschedulable sequence: needs {seq.num_blocks} blocks, pool has "
                f"{self.block_manager.num_blocks} total"
            )
        return decode

    def _preempt(self, seq: Sequence) -> None:
        self.num_preemptions += 1
        seq.status = SequenceStatus.WAITING
        self.block_manager.deallocate(seq)
        if seq.slot is not None:
            self.free_slots.append(seq.slot)
            seq.slot = None
        if seq in self.prefilling:
            self.prefilling.remove(seq)
        # Chunk progress dies with the KV blocks; prefill restarts on re-admit.
        seq.num_prefilled_tokens = 0
        seq.prefill_target = None
        self.waiting.appendleft(seq)

    def postprocess(self, seqs: list[Sequence], token_bursts: list[list[int]]) -> list[Sequence]:
        """Append sampled tokens (a burst per sequence — tokens past a stop
        condition are discarded); seal prefix-cache hashes for newly-filled
        blocks; finish on EOS/stop-token (unless ignore_eos) or max_tokens."""
        finished = []
        for seq, burst in zip(seqs, token_bursts):
            if seq.status == SequenceStatus.FINISHED:
                # Aborted while the device step was in flight: its blocks and
                # slot are already released — discard the burst entirely.
                continue
            mid_prefill = False
            if seq.prefill_target is not None and seq.num_prefilled_tokens < seq.prefill_target:
                # A prefill chunk just ran on device: advance progress; on
                # the final chunk the sequence's whole token range has KV
                # (cache hits on its blocks become safe) and it joins decode.
                # The completion test must match the runner's _is_final_chunk
                # (prefill_target >= len(seq)): a preempted-then-readmitted
                # sequence has len(seq) > num_prompt_tokens, and promoting on
                # prompt coverage alone would enter decode with KV for
                # [chunk_end, len) never written.
                seq.num_prefilled_tokens = seq.prefill_target
                if seq.num_prefilled_tokens >= len(seq):
                    self.block_manager.mark_computed(seq)
                    if seq in self.prefilling:
                        self.prefilling.remove(seq)
                        self.running.append(seq)
                else:
                    mid_prefill = True
            sp = seq.sampling_params
            stop_ids = set(sp.stop_token_ids) | self.eos_token_ids
            for token_id in burst:
                seq.append_token(token_id)
                if not sp.ignore_eos and token_id in stop_ids:
                    seq.finish_reason = "stop"
                    break
                if (
                    seq.num_completion_tokens >= sp.max_tokens
                    or len(seq) >= self.config.max_model_len
                ):
                    seq.finish_reason = "length"
                    break
            self.block_manager.seal_full_blocks(seq)
            if seq.finish_reason is None:
                # Window recycling must wait for the chunk train to finish:
                # mid-prefill, blocks in [num_prefilled, len-window) hold KV
                # that later chunks still need to WRITE — freeing them would
                # point the next chunk's scatter at the placeholder block 0.
                if self.sliding_window and not mid_prefill:
                    self.block_manager.release_behind_window(seq, self.sliding_window)
                continue
            seq.status = SequenceStatus.FINISHED
            self.block_manager.deallocate(seq)
            if seq.slot is not None:
                self.free_slots.append(seq.slot)
                seq.slot = None
            self.running.remove(seq)
            finished.append(seq)
        return finished
