"""Dense-combine vs capacity-bounded dispatch MoE crossover at Granite-MoE-1B
shapes (32 experts, top-8, hidden 1024, inner 512), on the real chip.

Decides the preset's moe_capacity_factor (VERDICT r2 weak #4: dispatch was
opt-in and never exercised / benched). Dense computes every token through all
X experts (exact); dispatch computes T*k*factor/X per expert (capacity-drop
semantics). FLOP ratio is X/k = 4x in dispatch's favor; the question is
where gather/scatter overhead eats it at serving batch sizes.

Run: python tools/ubench_moe.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.config import ActivationType, ModelConfig, NormType, PositionType
from nanovllm_tpu.ops import moe as moe_ops
from tools.ubench_int4 import bench


def main():
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    cfg = ModelConfig(
        vocab_size=49155, hidden_size=1024, num_layers=1, num_heads=16,
        num_kv_heads=8, intermediate_size=512, max_seq_len=4096,
        norm_type=NormType.RMSNORM, position_type=PositionType.ROPE,
        activation=ActivationType.SWIGLU,
        num_experts=32, num_experts_per_tok=8, moe_intermediate_size=512,
        dtype="bfloat16", eos_token_id=0,
    )
    rng = np.random.default_rng(0)
    p = moe_ops.init_moe_params(cfg, rng)
    p = {
        k: (jnp.asarray(v, jnp.bfloat16) if not isinstance(v, dict)
            else {kk: jnp.asarray(vv, jnp.bfloat16) for kk, vv in v.items()})
        for k, v in p.items()
    }

    for T in (32, 64, 256, 1024, 4096):
        x = jnp.asarray(rng.standard_normal((T, cfg.hidden_size)) * 0.1, jnp.bfloat16)
        reps = max(8, min(128, 16384 // T))
        res = {}
        res["dense"] = bench(
            lambda x_, pp: moe_ops.moe_forward(cfg, pp, x_), (x, p), reps, "dense"
        )
        for f in (1.0, 1.25, 2.0):
            # min_tokens=1 so every T row actually exercises the dispatch
            # program this tool claims to time (the default 1024 gate would
            # silently run dense for small T and fake identical timings).
            cfg_f = dataclasses.replace(
                cfg, moe_capacity_factor=f, moe_dispatch_min_tokens=1
            )
            res[f"disp{f}"] = bench(
                lambda x_, pp, cfg_f=cfg_f: moe_ops.moe_forward(cfg_f, pp, x_),
                (x, p), reps, f"disp{f}",
            )
        import math

        C = math.ceil(T * cfg.num_experts_per_tok / cfg.num_experts * 1.25)
        C = min(max(8 * math.ceil(C / 8), 8), T)
        stats = moe_ops.moe_dispatch_drop_stats(cfg, p, x, C)
        print(
            f"T={T:5d} " + " ".join(f"{k}={v*1e6:9.1f}us" for k, v in res.items())
            + f"  drop@f1.25={stats['drop_rate']:.3%} (random-weight routing"
            " is near-uniform; measure on a real checkpoint before serving)",
            flush=True,
        )


if __name__ == "__main__":
    main()
