"""Unified Q&A CLI — the flagship entry point.

Capability parity with /root/reference/cmd/ask/main.go (model registry,
chat-format templating, -temp / -max-tokens flags, streaming output,
prefill/decode tok/s stats, EOS + stop-string handling) — but running through
the real engine (scheduler + paged KV + batched device sampling) instead of
bypassing it like the reference does (SURVEY.md §3.1), and with native
tokenization instead of a per-request python subprocess.

Usage:
  python -m cli.ask --model-dir /path/to/ckpt "What is the capital of France?"
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="Ask a model a question")
    ap.add_argument("question", nargs="+")
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--temp", type=float, default=0.0, help="0 = greedy")
    ap.add_argument("--top-k", type=int, default=0)
    ap.add_argument("--top-p", type=float, default=1.0)
    ap.add_argument("--rep-penalty", type=float, default=1.0)
    ap.add_argument("--max-tokens", type=int, default=0, help="0 = max_seq_len/4")
    ap.add_argument("--chat-format", default=None, help="llama3|falcon|granite|mistral|completion")
    ap.add_argument("--quantization", default="none", choices=["none", "int8", "int4"])
    ap.add_argument("--kv-cache-dtype", default="none", choices=["none", "int8"])
    ap.add_argument("--tensor-parallel-size", type=int, default=1,
                    help="shard attention heads / FFN / experts over this many chips")
    ap.add_argument("--context-parallel", action="store_true",
                    help="ring-attention prefill for long prompts over the "
                         "mesh ('data' axis when dp>1, else 'model'); cached "
                         "prefixes page in from the pool as an extra flash "
                         "source; hybrids excluded")
    ap.add_argument("--prefill-chunk-tokens", type=int, default=0,
                    help="admit long prompts in chunks of at most this many "
                         "tokens per step (0 = whole-prompt); bounds "
                         "concurrent requests' TTFT under long prompts")
    ap.add_argument("--prefill-fixed-groups", action="store_true",
                    help="pad every prefill dispatch/sampling batch to ONE "
                         "shape per bucket: fewer compiled programs, decisive "
                         "on devices with small executable caches (program "
                         "reload measured at 15-30s on the tunneled dev "
                         "chip; see docs/PERFORMANCE.md serving notes)")
    ap.add_argument("--raw", action="store_true", help="no chat template")
    args = ap.parse_args(argv)
    question = " ".join(args.question)

    from nanovllm_tpu.config import EngineConfig
    from nanovllm_tpu.engine.llm import LLM
    from nanovllm_tpu.sampling_params import SamplingParams
    from nanovllm_tpu.tokenizer.chat_templates import (
        STOP_STRINGS, chat_format_for_model_type, format_prompt,
        format_prompt_for_checkpoint,
    )

    t0 = time.time()
    llm = LLM(
        model=args.model_dir,
        engine_config=EngineConfig(
            quantization=args.quantization, kv_cache_dtype=args.kv_cache_dtype,
            tensor_parallel_size=args.tensor_parallel_size,
            prefill_chunk_tokens=args.prefill_chunk_tokens,
            context_parallel=args.context_parallel,
            prefill_fixed_groups=args.prefill_fixed_groups,
        ),
    )
    mcfg = llm.model_config
    print(f"[load] {args.model_dir} ({mcfg.model_type}, "
          f"{mcfg.num_params_estimate()/1e6:.0f}M params) in {time.time()-t0:.1f}s",
          file=sys.stderr)

    fmt = args.chat_format or chat_format_for_model_type(mcfg.model_type)
    if args.raw:
        prompt = question
    elif args.chat_format:  # explicit format wins over the checkpoint template
        prompt = format_prompt(question, fmt)
    else:
        prompt = format_prompt_for_checkpoint(args.model_dir, question, fmt)
    max_tokens = args.max_tokens or mcfg.max_seq_len // 4
    sp = SamplingParams(
        temperature=args.temp, top_k=args.top_k, top_p=args.top_p,
        repetition_penalty=args.rep_penalty, max_tokens=max_tokens,
    )

    eng = llm.engine
    seq_id = eng.add_request(prompt, sp)
    seq = eng._seqs[seq_id]
    stops = STOP_STRINGS.get(fmt, ())
    printed = 0
    text = ""
    t_first = None
    t_start = time.time()
    while not eng.is_finished():
        eng.step()
        comp = seq.completion_token_ids
        if comp and t_first is None:
            t_first = time.time()
        new_text = eng.tokenizer.decode(comp)
        if any(s in new_text for s in stops):
            new_text = new_text[: min(new_text.index(s) for s in stops if s in new_text)]
            sys.stdout.write(new_text[printed:])
            sys.stdout.flush()
            printed = len(new_text)
            break
        sys.stdout.write(new_text[printed:])
        sys.stdout.flush()
        printed = len(new_text)
    print()

    m = eng.metrics
    ttft = (t_first - t_start) if t_first else 0.0
    pre = m["prefill_tokens"] / m["prefill_time"] if m["prefill_time"] else 0
    dec = m["decode_tokens"] / m["decode_time"] if m["decode_time"] else 0
    print(
        f"[stats] ttft={ttft*1000:.0f}ms prefill={pre:.1f} tok/s decode={dec:.1f} tok/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
