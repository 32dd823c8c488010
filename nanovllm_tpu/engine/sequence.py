"""Request lifecycle record.

Capability parity with /root/reference/nanovllm/sequence.go — status enum
(:8-12), token bookkeeping, block-view helpers (:87-108), per-sequence
sampling params, atomic id counter (:30-34). Differences: block size comes
from the engine config instead of being hardcoded to 256 (sequence.go:52), and
the sequence carries its assigned decode slot (the TPU runner's fixed batch
lane) — a concept the serial CPU reference never needed.
"""

from __future__ import annotations

import enum
import itertools
from typing import Optional

from nanovllm_tpu.sampling_params import SamplingParams


class SequenceStatus(enum.Enum):
    WAITING = "waiting"
    RUNNING = "running"
    FINISHED = "finished"


_seq_counter = itertools.count()


class Sequence:
    def __init__(self, token_ids: list[int], sampling_params: SamplingParams, block_size: int):
        self.seq_id: int = next(_seq_counter)
        self.status = SequenceStatus.WAITING
        self.token_ids: list[int] = list(token_ids)
        self.num_prompt_tokens: int = len(token_ids)
        self.num_cached_tokens: int = 0  # prefix-cache hits (tokens whose KV is reused)
        # Chunked-prefill progress: prompt tokens whose KV is computed (set to
        # num_cached_tokens at admission, advanced per chunk in postprocess).
        self.num_prefilled_tokens: int = 0
        # End offset of the prefill chunk scheduled THIS step (== len(seq)
        # for whole-prompt admission and for the final chunk).
        self.prefill_target: Optional[int] = None
        self.block_table: list[int] = []
        # Leading block-table entries released by the sliding-window recycler
        # (block_manager.release_behind_window) — placeholders, not live ids.
        self.num_released_blocks: int = 0
        self.sampling_params = sampling_params
        self.block_size = block_size
        self.slot: Optional[int] = None  # decode batch lane while RUNNING
        self.finish_reason: Optional[str] = None
        self.retries: int = 0  # failed-step requeues (EngineConfig.max_retries_per_request)

    def __len__(self) -> int:
        return len(self.token_ids)

    @property
    def num_completion_tokens(self) -> int:
        return len(self.token_ids) - self.num_prompt_tokens

    @property
    def prompt_token_ids(self) -> list[int]:
        return self.token_ids[: self.num_prompt_tokens]

    @property
    def completion_token_ids(self) -> list[int]:
        return self.token_ids[self.num_prompt_tokens :]

    @property
    def num_blocks(self) -> int:
        return (len(self.token_ids) + self.block_size - 1) // self.block_size

    @property
    def last_block_num_tokens(self) -> int:
        return len(self.token_ids) - (self.num_blocks - 1) * self.block_size

    def block(self, i: int) -> list[int]:
        return self.token_ids[i * self.block_size : (i + 1) * self.block_size]

    @property
    def num_cached_blocks(self) -> int:
        return self.num_cached_tokens // self.block_size

    def append_token(self, token_id: int) -> None:
        self.token_ids.append(token_id)

    @property
    def is_finished(self) -> bool:
        return self.status == SequenceStatus.FINISHED
