"""Batch generation runner over the engine path.

Capability parity with /root/reference/cmd/generic-runner/main.go: MODEL_DIR
discovery, engine config, batched generate over default or user prompts,
throughput report.

Usage:
  MODEL_DIR=/path/to/ckpt python -m cli.run_batch [prompt ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

DEFAULT_PROMPTS = [
    "The capital of France is",
    "Once upon a time",
    "The meaning of life is",
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("prompts", nargs="*", default=None)
    ap.add_argument("--model-dir", default=os.environ.get("MODEL_DIR"))
    ap.add_argument("--max-tokens", type=int, default=64)
    ap.add_argument("--temp", type=float, default=0.0)
    ap.add_argument("--max-num-seqs", type=int, default=16)
    ap.add_argument("--quantization", default="none", choices=["none", "int8", "int4"])
    ap.add_argument("--tensor-parallel-size", type=int, default=1)
    ap.add_argument("--prefill-fixed-groups", action="store_true",
                    help="one fixed shape per prefill bucket (small "
                         "executable caches; docs/PERFORMANCE.md)")
    args = ap.parse_args(argv)
    if not args.model_dir:
        print("set MODEL_DIR or pass --model-dir", file=sys.stderr)
        return 2

    from nanovllm_tpu.config import EngineConfig
    from nanovllm_tpu.engine.llm import LLM
    from nanovllm_tpu.sampling_params import SamplingParams

    prompts = args.prompts or DEFAULT_PROMPTS
    llm = LLM(
        model=args.model_dir,
        engine_config=EngineConfig(
            max_num_seqs=args.max_num_seqs, quantization=args.quantization,
            tensor_parallel_size=args.tensor_parallel_size,
            prefill_fixed_groups=args.prefill_fixed_groups,
        ),
    )
    sp = SamplingParams(temperature=args.temp, max_tokens=args.max_tokens)
    t0 = time.time()
    outs = llm.generate(prompts, sp)
    dt = time.time() - t0
    for p, o in zip(prompts, outs):
        print(f"--- prompt: {p!r}")
        print(o.text)
    tp = llm.engine.throughput()
    print(
        f"[stats] {len(prompts)} seqs in {dt:.1f}s | prefill {tp['prefill_tok_s']:.1f} tok/s "
        f"| decode {tp['decode_tok_s']:.1f} tok/s",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
