"""Per-request sampling parameters.

Capability parity with BOTH of the reference's sampling stacks (it has two
disjoint ones, SURVEY.md §2.5-3): the engine-level params
(/root/reference/nanovllm/sampling_params.go:16 — temperature, max_tokens,
ignore_eos) and the tensor-level params
(/root/reference/purego/tensor/sampling.go:10-15 — temperature, top_p, top_k,
repetition_penalty). Unlike the reference's engine layer (which forbids greedy,
sampling_params.go:35-39, while its own CLI defaults to greedy), greedy is a
first-class setting here: temperature == 0.0 means argmax.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class SamplingParams:
    temperature: float = 1.0  # 0.0 => greedy (argmax)
    top_p: float = 1.0
    top_k: int = 0  # 0 => disabled
    repetition_penalty: float = 1.0  # 1.0 => disabled
    max_tokens: int = 64
    ignore_eos: bool = False
    seed: int | None = None
    # Extra stop token ids beyond the model's EOS (e.g. chat end-of-turn).
    stop_token_ids: tuple[int, ...] = ()

    def __post_init__(self):
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if not 0 < self.top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")
        if self.top_k < 0:
            raise ValueError("top_k must be >= 0")
        if self.repetition_penalty <= 0:
            raise ValueError("repetition_penalty must be > 0")
        if self.max_tokens < 1:
            raise ValueError("max_tokens must be >= 1")

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0
