"""Perplexity / quantization-quality CLI.

Computes PPL of a checkpoint on a text file (or built-in sample) at bf16 and
optionally at INT8/INT4, reporting ΔPPL against the unquantized run — the
acceptance metric from BASELINE.json (≤0.1 @INT8, ≤0.5 @INT4).

Usage:
  python -m cli.eval_ppl --model-dir CKPT [--text-file f.txt] [--quantization int8 int4]
"""

from __future__ import annotations

import argparse
import sys

SAMPLE_TEXT = (
    "The tower is 324 metres tall, about the same height as an 81-storey "
    "building. Its base is square, measuring 125 metres on each side. During "
    "its construction, the Eiffel Tower surpassed the Washington Monument to "
    "become the tallest man-made structure in the world."
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--text-file", default=None,
                    help="corpus file (e.g. WikiText raw); default: built-in sample")
    ap.add_argument("--max-tokens", type=int, default=0, help="0 = whole corpus")
    ap.add_argument("--window", type=int, default=1024,
                    help="context window per strided evaluation step")
    ap.add_argument("--stride", type=int, default=512,
                    help="tokens scored per window (rest is context)")
    ap.add_argument("--quantization", nargs="*", default=[], choices=["int8", "int4"])
    ap.add_argument("--gate", action="store_true",
                    help="enforce the BASELINE dPPL acceptance gates "
                         "(int8 <= 0.1, int4 <= 0.5) via the exit code")
    ap.add_argument("--gate-int8", type=float, default=0.1)
    ap.add_argument("--gate-int4", type=float, default=0.5)
    args = ap.parse_args(argv)

    from nanovllm_tpu.eval.ppl import strided_perplexity
    from nanovllm_tpu.io.loader import load_model_dir
    from nanovllm_tpu.tokenizer import load_tokenizer

    text = SAMPLE_TEXT
    if args.text_file:
        with open(args.text_file) as f:
            text = f.read()
    tok = load_tokenizer(args.model_dir)
    ids = tok.encode(text)
    if args.max_tokens:
        ids = ids[: args.max_tokens]
    print(
        f"evaluating {len(ids)} tokens, window={args.window} stride={args.stride}",
        file=sys.stderr,
    )

    def run(quantization="none"):
        cfg, params = load_model_dir(
            args.model_dir, dtype="bfloat16", quantization=quantization
        )
        window = min(args.window, cfg.max_seq_len)
        stride = min(args.stride, window)
        return strided_perplexity(cfg, params, ids, window=window, stride=stride)

    base_ppl = run()
    print(f"ppl[bf16] = {base_ppl:.4f}")
    gates = {"int8": args.gate_int8, "int4": args.gate_int4}
    failed = []
    for q in args.quantization:
        ppl_q = run(q)
        dppl = ppl_q - base_ppl
        verdict = ""
        if args.gate:
            ok = dppl <= gates[q]
            verdict = f"  gate(<= {gates[q]}): {'PASS' if ok else 'FAIL'}"
            if not ok:
                failed.append(q)
        print(f"ppl[{q}] = {ppl_q:.4f}  dPPL = {dppl:+.4f}{verdict}")
    if failed:
        print(f"dPPL gate FAILED for: {', '.join(failed)}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
