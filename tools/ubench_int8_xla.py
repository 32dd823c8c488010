"""A/B: Pallas INT8 quant-matmul kernel vs XLA-native convert+dot at the
Llama-1B decode shapes. The r5 trace shows XLA attention fusions streaming
~1.4 TB/s while the quant kernels sustain ~0.75 TB/s — if XLA's fused
convert-into-dot streams int8 weights at fusion bandwidth, the XLA
formulation wins despite the materialized-weight risk (this ubench is the
evidence either way).

Timing: differenced device-synced walls (np.asarray fetch), min of N.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.bench_common import log


def timed(fn, *args, n=10):
    np.asarray(jax.device_get(fn(*args)))  # compile + sync
    outs = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn(*args)))  # true sync through the tunnel
        outs.append(time.perf_counter() - t0)
    return min(outs)


def main():
    from nanovllm_tpu.ops.quant import QuantLinear, quantize_int8
    from nanovllm_tpu.ops.linear import linear  # dispatches to the kernel

    B = int(os.environ.get("UB_B", "64"))
    shapes = [
        ("qkv", 2048, 3072),
        ("o", 2048, 2048),
        ("gate_up", 2048, 16384),
        ("down", 8192, 2048),
        ("lm_head", 2048, 128256),
    ]
    rng = np.random.default_rng(0)
    REP = 2  # repeat the matmul over independent weight copies per call so
    #          one timed call amortizes the fetch + dispatch overhead and the
    #          weights can't be HBM-resident-cache artifacts

    log(f"backend={jax.default_backend()} B={B} rep={REP}")
    print(f"{'shape':>8} {'KxN':>14} {'int8MB':>7} {'kernel':>9} {'xla':>9} "
          f"{'k GB/s':>8} {'x GB/s':>8}")
    for name, K, N in shapes:
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)
        qs, ss = [], []
        for r in range(REP):
            w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
            q, sc = quantize_int8(w)
            qs.append(jnp.asarray(q))
            ss.append(jnp.asarray(sc))
        mb = qs[0].nbytes / 1e6

        # Enough chained matmuls that the streamed bytes (~8 GB) dominate
        # the ~25 ms dispatch+fetch round-trip; operands perturbed per iter
        # so XLA cannot CSE the repeats.
        ITER = min(1024, max(32, int(8e9 / (mb * 1e6))))

        def kernel_fn(x, qs, ss):
            acc = jnp.float32(0)
            for i in range(ITER):
                xi = x * (1 + jnp.bfloat16(i * 1e-8))
                y = linear(QuantLinear(qs[i % REP], ss[i % REP], None, "int8", K, N), xi)
                acc = acc + y[0, 0]
            return acc

        def xla_fn(x, qs, ss):
            acc = jnp.float32(0)
            for i in range(ITER):
                xi = x * (1 + jnp.bfloat16(i * 1e-8))
                y = jax.lax.dot_general(
                    xi, qs[i % REP].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * ss[i % REP]
                acc = acc + y[0, 0]
            return acc

        tk = timed(jax.jit(kernel_fn), x, qs, ss) / ITER
        tx = timed(jax.jit(xla_fn), x, qs, ss) / ITER
        print(f"{name:>8} {K}x{N:>8} {mb:7.1f} {tk*1e6:8.1f}u {tx*1e6:8.1f}u "
              f"{mb/1e3/tk:8.0f} {mb/1e3/tx:8.0f}")


if __name__ == "__main__":
    main()
