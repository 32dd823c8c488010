"""Mock end-to-end pipeline demo — scheduler + block manager + engine with no
model weights (capability parity with /root/reference/cmd/simple-demo/main.go,
the reference's only full-stack model-free exercise)."""

from __future__ import annotations

from nanovllm_tpu.config import EngineConfig
from nanovllm_tpu.engine.engine import LLMEngine, MockTokenizer
from nanovllm_tpu.engine.runner import MockModelRunner
from nanovllm_tpu.sampling_params import SamplingParams


def main():
    eng = LLMEngine(
        None,
        EngineConfig(
            max_num_batched_tokens=4096, max_num_seqs=8, max_model_len=512,
            kv_block_size=16, eos_token_id=0, max_decode_slots=8,
        ),
        runner=MockModelRunner(eos_token_id=0, eos_every=12),
        tokenizer=MockTokenizer(),
        num_kv_blocks=256,
    )
    prompts = ["Hello, nano-vllm on TPU!", "Continuous batching", "Paged KV cache"]
    outs = eng.generate(prompts, SamplingParams(max_tokens=24))
    for p, o in zip(prompts, outs):
        print(f"prompt={p!r}\n  -> ({o.finish_reason}) {o.token_ids}")
    print(eng.throughput())


if __name__ == "__main__":
    main()
