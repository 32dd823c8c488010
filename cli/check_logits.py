"""Golden-logit parity checker.

Capability parity with /root/reference/cmd/check-logits/main.go (forward a
fixed prompt, print top-5 tokens + logit stats, compare against a PyTorch
reference value). With --hf-compare it runs the same checkpoint through
HuggingFace transformers on CPU and reports the max logit divergence — the
reference methodology (SURVEY.md §4) as a tool.

Usage:
  python -m cli.check_logits --model-dir CKPT --prompt "The capital of Germany is" [--hf-compare]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--prompt", default="The capital of Germany is")
    ap.add_argument("--expect-token", default=None, help="token text to report the logit of")
    ap.add_argument("--expect-logit", type=float, default=None)
    ap.add_argument("--hf-compare", action="store_true")
    ap.add_argument("--quantization", default="none", choices=["none", "int8", "int4"])
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from nanovllm_tpu.io.loader import load_model_dir
    from nanovllm_tpu.models import model as M
    from nanovllm_tpu.ops import kv_cache as kvc
    from nanovllm_tpu.tokenizer import load_tokenizer

    cfg, params = load_model_dir(args.model_dir, dtype="float32", quantization=args.quantization)
    tok = load_tokenizer(args.model_dir)
    ids = tok.encode(args.prompt)
    print(f"prompt tokens ({len(ids)}): {ids}")

    bs = 16
    nb = (len(ids) + bs - 1) // bs + 1
    pool = kvc.create_kv_pool(cfg.num_layers, nb, bs, cfg.num_kv_heads, cfg.head_dim, dtype=jnp.float32)
    mamba_state = slot = None
    if cfg.is_hybrid:
        from nanovllm_tpu.ops import mamba2 as mo

        mamba_state, slot = mo.create_mamba_state(cfg, 1), jnp.int32(0)
    bt = np.arange(nb, dtype=np.int32)
    sm = kvc.make_slot_mapping(bt, 0, len(ids), bs, len(ids), nb * bs)
    T = len(ids)
    import jax

    @jax.jit
    def _prefill(params, tokens, positions, block_table, slot_mapping, pool, mamba_state):
        return M.prefill_chunk(
            params, cfg, tokens, positions, jnp.int32(T), jnp.int32(T),
            block_table, slot_mapping, pool, mamba_state, slot, bs,
        )

    logits, _, _ = _prefill(
        params, jnp.asarray(np.array(ids, np.int32)), jnp.arange(T, dtype=jnp.int32),
        jnp.asarray(bt), jnp.asarray(sm), pool, mamba_state,
    )
    logits = np.asarray(logits)
    top5 = np.argsort(logits)[::-1][:5]
    print("top-5:")
    for t in top5:
        print(f"  {t:>7d} {tok.decode([int(t)])!r:20s} logit={logits[t]:.4f}")
    print(f"logit stats: mean={logits.mean():.4f} std={logits.std():.4f} max={logits.max():.4f}")

    if args.expect_token is not None:
        tid = tok.encode(args.expect_token)
        print(f"logit[{args.expect_token!r} -> {tid}] = {logits[tid[0]]:.4f}"
              + (f" (expected {args.expect_logit})" if args.expect_logit else ""))

    if args.hf_compare:
        import torch
        from transformers import AutoModelForCausalLM

        hf = AutoModelForCausalLM.from_pretrained(args.model_dir, torch_dtype=torch.float32).eval()
        with torch.no_grad():
            ref = hf(torch.tensor([ids])).logits[0, -1].numpy()
        diff = np.abs(logits - ref)
        print(f"vs HF: max|Δ|={diff.max():.6f} mean|Δ|={diff.mean():.6f} "
              f"argmax match={np.argmax(logits) == np.argmax(ref)}")
        if diff.max() > 1e-2 and args.quantization == "none":
            print("WARNING: divergence above fp32 tolerance", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
