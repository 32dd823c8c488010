"""Microbenchmark: INT4 weight-only matmul at Falcon-7B decode shapes, on
the real chip. Decomposes the bench_falcon roofline gap by timing the
shipped kernel against the pure weight-stream floor.

Variants:
  stream  weight-DMA floor: same grid/blocks, kernel body only touches 8 rows
  cur     shipped quant_matmul (halves packing, mask+convert unpack, scale on
          acc; uses the real QuantLinear.from_dense storage padding)
  int8    shipped INT8 kernel (2x bytes, no unpack) for reference
  bf16    plain XLA dot on bf16 weights (4x bytes)

History: r2/r3 carried ~6 exploratory kernels (d128/fold/w4a8/hi3/u16*/cvt*)
written against the RETIRED group-paired packing. Their findings are folded
into the shipped kernel (mask+convert unpack — see ops/pallas/quant_matmul.py
and docs/PERFORMANCE.md "Kernel facts") and the variants were deleted in r4:
their numerics were stale under the halves packing, and a bench whose
variants compute wrong answers invites false conclusions. New experiments
must pack with quantize_int4 (halves packing) and verify numerics against
quant_matmul before timing.

Run: python tools/ubench_int4.py [--reps 8]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanovllm_tpu.ops.pallas.quant_matmul import quant_matmul
from nanovllm_tpu.ops.quant import INT4_GROUP_SIZE, QuantLinear, quantize_int4, quantize_int8

HBM_GBPS = 819  # v5e

# Falcon-7B decode matmul shapes (padded as QuantLinear pads them).
# (name, K_pad, N_pad)
SHAPES = [
    ("qkv", 4608, 4736),      # fused QKV: (71+2)*64 = 4672 -> 4736
    ("dense", 4608, 4608),
    ("mlp_up", 4608, 18176),
    ("mlp_down", 18432, 4608),
    ("lm_head", 4608, 65024),
]
BM = 32  # decode lanes


# --- stream floor ---------------------------------------------------------

def _stream_kernel(x_ref, qw_ref, scale_ref, o_ref):
    o_ref[:] = (
        jnp.sum(qw_ref[0:8, :].astype(jnp.float32), axis=0, keepdims=True)
        + x_ref[0:1, 0:1]
        + scale_ref[0:1, :]
    ) * jnp.ones_like(o_ref)


def _call_stream(x, qw, scale, K, N, bn, BK):
    bm = x.shape[0]
    nk = K // BK
    return pl.pallas_call(
        _stream_kernel,
        grid=(1, N // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, BK), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK // 2, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK // INT4_GROUP_SIZE, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x, qw, scale)


def bench(fn, args, reps, tag):
    """Time fn(*args) with reps chained inside one jit. The input is rolled
    by the loop index each iteration (defeats CSE and linearity hoisting) and
    the full output is reduced (defeats slice-through-dot simplification).
    Per-call fixed overhead is removed by differencing two rep counts.

    The tunnel adds O(ms) wall-clock jitter per measurement, so the
    differenced span (3*reps calls) must dwarf it: callers should pass reps
    such that reps * t_est >= ~10ms (see reps_for), and we take min-of-5."""

    def make(r):
        def run(x, *rest):
            def body(i, acc):
                y = fn(jnp.roll(x, i, axis=1), *rest)
                return acc + jnp.sum(y.astype(jnp.float32))

            return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))

        return jax.jit(run)

    times = {}
    for r in (reps, 4 * reps):
        j = make(r)
        float(j(*args))  # compile + real sync (block_until_ready is async on axon)
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(j(*args))
            best = min(best, time.perf_counter() - t0)
        times[r] = best
    return (times[4 * reps] - times[reps]) / (3 * reps)


def reps_for(floor_ms: float, target_ms: float = 10.0, cap: int = 512) -> int:
    """Rep count so the low-rep leg spans >= target_ms of device time."""
    return max(8, min(cap, int(target_ms / max(floor_ms, 1e-3))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=0, help="0 = auto per shape (reps_for)")
    ap.add_argument("--shapes", default="")
    ap.add_argument(
        "--variants",
        default="stream,cur",
        help="comma list from stream,cur,int8,bf16",
    )
    ap.add_argument("--bk", type=int, default=0, help="override k-chunk")
    ap.add_argument("--bn", type=int, default=0, help="override n-tile")
    ap.add_argument("--bm", type=int, default=BM, help="decode lanes")
    args = ap.parse_args()
    want = set(args.variants.split(","))
    bm = args.bm
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    rng = np.random.default_rng(0)

    totals = {}
    rows = []
    for name, K, N in SHAPES:
        if args.shapes and name not in args.shapes.split(","):
            continue
        w = (rng.standard_normal((K, N)) * 0.02).astype(np.float32)
        packed, scales = quantize_int4(w)
        q8, s8 = quantize_int8(w)
        x = jnp.asarray(rng.standard_normal((bm, K)) * 0.1, jnp.bfloat16)
        qwd = jnp.asarray(packed)
        scd = jnp.asarray(scales)
        wbf = jnp.asarray(w, jnp.bfloat16)

        i4bytes = K * N // 2 + (K // INT4_GROUP_SIZE) * N * 4
        floor_ms = i4bytes / (HBM_GBPS * 1e9) * 1e3

        BK = args.bk or (2048 if K > 8192 else K)
        bn = args.bn or (128 if BK >= 2048 else 256)

        shape_reps = args.reps or reps_for(floor_ms)

        results = {}
        if "stream" in want:
            results["stream"] = bench(
                lambda x_, qw_, sc_: _call_stream(x_, qw_, sc_, K, N, bn, BK),
                (x, qwd, scd), shape_reps, "stream",
            )
        if "cur" in want:
            # from_dense applies the real storage padding (K / N rules), so
            # this measures the shipped kernel exactly as the engine runs it.
            p4d = QuantLinear.from_dense(w, None, "int4")
            p4d = QuantLinear(jnp.asarray(p4d.qw), jnp.asarray(p4d.scale), None, "int4", p4d.n_in, p4d.n_out)
            results["cur"] = bench(
                lambda x_, p4d=p4d: quant_matmul(x_, p4d), (x,), shape_reps, "cur",
            )
        if "int8" in want:
            results["int8"] = bench(
                lambda x_, qw_, sc_: quant_matmul(x_, QuantLinear(qw_, sc_, None, "int8", K, N)),
                (x, jnp.asarray(q8), jnp.asarray(s8)), shape_reps, "int8",
            )
        if "bf16" in want:
            results["bf16"] = bench(
                lambda x_, w_: jnp.dot(x_, w_, preferred_element_type=jnp.float32),
                (x, wbf), shape_reps, "bf16",
            )

        row = {"shape": f"{name} {K}x{N}", "floor_ms": floor_ms}
        for tag, t in results.items():
            row[tag] = t * 1e3
            totals.setdefault(tag, 0.0)
            totals[tag] += t * 1e3 * (32 if name != "lm_head" else 1)
        rows.append(row)
        print(
            f"{name:9s} K={K:5d} N={N:5d} floor={floor_ms:6.3f}ms | "
            + " ".join(f"{tag}={v*1e3:6.3f}" for tag, v in results.items()),
            flush=True,
        )

    if len(rows) == len(SHAPES):
        layer_floor = sum(r["floor_ms"] * (32 if not r["shape"].startswith("lm_head") else 1) for r in rows)
        print(f"\nmodeled step (32 layers + lm_head): floor={layer_floor:.2f}ms")
        for tag, tot in totals.items():
            print(f"  {tag:7s} {tot:7.2f}ms  fraction={layer_floor/tot:.3f}  tok/s@{bm}={bm/tot*1e3:,.0f}")


if __name__ == "__main__":
    main()
