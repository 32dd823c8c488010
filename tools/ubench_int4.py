"""Microbenchmark: INT4 weight-only matmul variants at Falcon-7B decode
shapes, on the real chip. Decomposes the bench_falcon roofline gap
(VERDICT r2: fraction 0.30, self-diagnosed VPU nibble-unpack cost) by
timing each candidate kernel against the pure weight-stream floor.

Variants:
  stream  weight-DMA floor: same grid/blocks, kernel body only touches 8 rows
  cur     shipped quant_matmul (halves packing, depth-128 group dots, scale
          on acc; uses the real QuantLinear.from_dense storage padding)
  NOTE: the exploratory variants below (d128/fold/w4a8/hi3/u16*/cvt*) were
  written against the RETIRED group-paired packing — their numerics are
  stale under the halves packing; they remain for timing archaeology only.
  d128    in-kernel concat to [g,128,bn] + batched depth-128 bf16 dots
  fold    unpack -> bf16, per-group scale folded into the weight tile,
          ONE full-depth dot per grid step (numerics == dequant fallback)
  w4a8    weights unpacked to int8, activations quantized per (row, chunk)
          to int8, int8 x int8 MXU dots with int32 accum, f32 rescale
  int8    shipped INT8 kernel (2x bytes, no unpack) for reference
  bf16    plain XLA dot on bf16 weights (4x bytes)

Run: python tools/ubench_int4.py [--reps 8]
"""
from __future__ import annotations

import argparse
import functools
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


def _unpack_planes(p32, dtype):
    low = jnp.right_shift(jnp.left_shift(p32, 28), 28).astype(dtype)
    high = jnp.right_shift(jnp.left_shift(p32, 24), 28).astype(dtype)
    return low, high


# --- stream floor ---------------------------------------------------------

def _stream_kernel(x_ref, qw_ref, scale_ref, o_ref):
    o_ref[:] = (
        jnp.sum(qw_ref[0:8, :].astype(jnp.float32), axis=0, keepdims=True)
        + x_ref[0:1, 0:1]
        + scale_ref[0:1, :]
    ) * jnp.ones_like(o_ref)


# --- d128: concat to depth-128 groups, batched bf16 dots ------------------

def _d128_kernel(x_ref, qw_ref, scale_ref, o_ref, acc_ref, *, nk, gpb):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    bm, BK = x.shape
    bn = qw_ref.shape[1]
    half = INT4_GROUP_SIZE // 2
    g = BK // INT4_GROUP_SIZE
    low, high = _unpack_planes(qw_ref[:].astype(jnp.int32), x.dtype)
    w = jnp.concatenate(
        [low.reshape(g, half, bn), high.reshape(g, half, bn)], axis=1
    )  # [g, 128, bn]
    xg = x.reshape(bm, g, INT4_GROUP_SIZE).transpose(1, 0, 2)  # [g, bm, 128]
    yg = jax.lax.dot_general(
        xg, w, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [g, bm, bn]
    sc = scale_ref[pl.ds(k * gpb, gpb), :].astype(jnp.float32)
    acc_ref[:] += jnp.sum(yg * sc.reshape(g, 1, bn), axis=0)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


# --- fold: scale folded into bf16 weights, one full-depth dot -------------

def _fold_kernel(x_ref, qw_ref, scale_ref, o_ref, acc_ref, *, nk, gpb):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    bm, BK = x.shape
    bn = qw_ref.shape[1]
    half = INT4_GROUP_SIZE // 2
    g = BK // INT4_GROUP_SIZE
    low, high = _unpack_planes(qw_ref[:].astype(jnp.int32), jnp.float32)
    sc = scale_ref[pl.ds(k * gpb, gpb), :].astype(jnp.float32)  # [g, bn]
    scb = jnp.broadcast_to(sc.reshape(g, 1, bn), (g, half, bn))
    wl = (low.reshape(g, half, bn) * scb).astype(x.dtype)
    wh = (high.reshape(g, half, bn) * scb).astype(x.dtype)
    w = jnp.concatenate([wl, wh], axis=1).reshape(BK, bn)
    # un-permute: group-paired rows (r low, r+64 high) are already in order
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


# --- hi3: current group-dot but high nibble via ONE arithmetic shift -------
# (p sign-extended from int8 => asr 4 is sign-correct for the high nibble)

def _hi3_kernel(x_ref, qw_ref, scale_ref, o_ref, acc_ref, *, nk, gpb):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    bm, BK = x.shape
    bn = qw_ref.shape[1]
    half = INT4_GROUP_SIZE // 2
    g = BK // INT4_GROUP_SIZE
    p32 = qw_ref[:].astype(jnp.int32)
    low = jnp.right_shift(jnp.left_shift(p32, 28), 28).astype(x.dtype)
    high = jnp.right_shift(p32, 4).astype(x.dtype)  # 1 shift, sign-correct
    sc = scale_ref[pl.ds(k * gpb, gpb), :].astype(jnp.float32)
    for gi in range(g):
        lo = gi * INT4_GROUP_SIZE
        part = (
            jnp.dot(x[:, lo:lo + half], low[gi * half:(gi + 1) * half, :],
                    preferred_element_type=jnp.float32)
            + jnp.dot(x[:, lo + half:lo + INT4_GROUP_SIZE],
                      high[gi * half:(gi + 1) * half, :],
                      preferred_element_type=jnp.float32)
        ) * sc[gi:gi + 1, :]
        acc_ref[:] += part

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


# --- u16 family: offset-binary nibbles -> bf16 via magic bitcast -----------
# Nibble n in [-8,7] is stored as n+8 in [0,15] (repack = byte ^ 0x88).
# bf16(128+m) for m in [0,15] is exactly 0x4300 | m, so
#   bitcast(0x4300 | nibble, bf16) - 136.0  ==  n   (exact bf16 arithmetic).
# All bit ops run at int16 density (2x int32) and there is no int->float
# convert at all — just and/or/shift/bitcast plus one exact bf16 subtract.

MAGIC = 0x4300
MAGIC_F = 136.0  # 128 + 8


def _unpack_u16(p16, dtype):
    lo = jax.lax.bitcast_convert_type(
        jnp.bitwise_or(jnp.bitwise_and(p16, 0xF), MAGIC).astype(jnp.int16),
        jnp.bfloat16,
    ) - jnp.bfloat16(MAGIC_F)
    hi = jax.lax.bitcast_convert_type(
        jnp.bitwise_or(
            jnp.bitwise_and(jnp.right_shift(p16, 4), 0xF), MAGIC
        ).astype(jnp.int16),
        jnp.bfloat16,
    ) - jnp.bfloat16(MAGIC_F)
    return lo.astype(dtype), hi.astype(dtype)


def _u16_kernel(x_ref, qw_ref, scale_ref, o_ref, acc_ref, *, nk, gpb):
    """Full-tile u16 unpack, then the group-paired dots (like `cur`)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    bm, BK = x.shape
    bn = qw_ref.shape[1]
    half = INT4_GROUP_SIZE // 2
    g = BK // INT4_GROUP_SIZE
    p16 = qw_ref[:].astype(jnp.int16)
    low, high = _unpack_u16(p16, x.dtype)
    sc = scale_ref[pl.ds(k * gpb, gpb), :].astype(jnp.float32)
    for gi in range(g):
        lo = gi * INT4_GROUP_SIZE
        part = (
            jnp.dot(x[:, lo:lo + half], low[gi * half:(gi + 1) * half, :],
                    preferred_element_type=jnp.float32)
            + jnp.dot(x[:, lo + half:lo + INT4_GROUP_SIZE],
                      high[gi * half:(gi + 1) * half, :],
                      preferred_element_type=jnp.float32)
        ) * sc[gi:gi + 1, :]
        acc_ref[:] += part

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _u16l_kernel(x_ref, qw_ref, scale_ref, o_ref, acc_ref, *, nk, gpb):
    """Per-group in-loop u16 unpack: temps are [64, bn] so VMEM stays ~(x +
    2*wq + out) — enables big weight-stationary tiles (large bn / BK)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    bm, BK = x.shape
    half = INT4_GROUP_SIZE // 2
    g = BK // INT4_GROUP_SIZE
    sc = scale_ref[pl.ds(k * gpb, gpb), :].astype(jnp.float32)
    for gi in range(g):
        p16 = qw_ref[pl.ds(gi * half, half), :].astype(jnp.int16)
        low, high = _unpack_u16(p16, x.dtype)
        lo = gi * INT4_GROUP_SIZE
        part = (
            jnp.dot(x[:, lo:lo + half], low, preferred_element_type=jnp.float32)
            + jnp.dot(x[:, lo + half:lo + INT4_GROUP_SIZE], high,
                      preferred_element_type=jnp.float32)
        ) * sc[gi:gi + 1, :]
        acc_ref[:] += part

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


def repack_offset_binary(packed: np.ndarray) -> np.ndarray:
    """Mixed packing (quantize_int4: high signed, low offset-binary) ->
    full offset-binary (both nibbles + 8) for the u16 variants."""
    return (np.asarray(packed).view(np.uint8) ^ 0x80).view(np.int8)


# --- cvt family: pure-int8 mask + direct int8->bf16 convert ----------------
# Mosaic legalizes bitwise AND on int8 and int8->bf16 converts (probed on
# v5e; only SHIFTS are illegal below int32). With the low nibble stored
# offset-binary (n+8) and the high nibble stored signed, the unpack is
#   lo = (v & 0x0F).astype(bf16) - 8        (exact: [0,15] -> [-8,7])
#   hi = (v & 0xF0).astype(bf16) * 0.0625   (sign rides the byte sign; the
#                                            masked value IS 16*hi_signed)
# — ~1.5 int32-equivalent VPU ops per packed byte (vs 7 for the int32-shift
# unpack): no widening, no shifts, no bitcasts.

def repack_mixed(packed: np.ndarray) -> np.ndarray:
    """quantize_int4 now emits the mixed packing natively (identity)."""
    return np.asarray(packed)


def _unpack_cvt(p8, dtype):
    lo = jnp.bitwise_and(p8, jnp.int8(0x0F)).astype(dtype) - jnp.asarray(8.0, dtype)
    hi = jnp.bitwise_and(p8, jnp.int8(-16)).astype(dtype) * jnp.asarray(0.0625, dtype)
    return lo, hi


def _cvt_kernel(x_ref, qw_ref, scale_ref, o_ref, acc_ref, *, nk, gpb):
    """Full-tile cvt unpack, then the group-paired dots (like `cur`)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    bm, BK = x.shape
    half = INT4_GROUP_SIZE // 2
    g = BK // INT4_GROUP_SIZE
    low, high = _unpack_cvt(qw_ref[:], x.dtype)
    sc = scale_ref[pl.ds(k * gpb, gpb), :].astype(jnp.float32)
    for gi in range(g):
        lo = gi * INT4_GROUP_SIZE
        part = (
            jnp.dot(x[:, lo:lo + half], low[gi * half:(gi + 1) * half, :],
                    preferred_element_type=jnp.float32)
            + jnp.dot(x[:, lo + half:lo + INT4_GROUP_SIZE],
                      high[gi * half:(gi + 1) * half, :],
                      preferred_element_type=jnp.float32)
        ) * sc[gi:gi + 1, :]
        acc_ref[:] += part

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _cvtl_kernel(x_ref, qw_ref, scale_ref, o_ref, acc_ref, *, nk, gpb):
    """Per-group in-loop cvt unpack (tiny VMEM temps -> big tiles)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    bm, BK = x.shape
    half = INT4_GROUP_SIZE // 2
    g = BK // INT4_GROUP_SIZE
    sc = scale_ref[pl.ds(k * gpb, gpb), :].astype(jnp.float32)
    for gi in range(g):
        low, high = _unpack_cvt(qw_ref[pl.ds(gi * half, half), :], x.dtype)
        lo = gi * INT4_GROUP_SIZE
        part = (
            jnp.dot(x[:, lo:lo + half], low, preferred_element_type=jnp.float32)
            + jnp.dot(x[:, lo + half:lo + INT4_GROUP_SIZE], high,
                      preferred_element_type=jnp.float32)
        ) * sc[gi:gi + 1, :]
        acc_ref[:] += part

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


# --- w4a8: int8 MXU dots --------------------------------------------------

def _w4a8_kernel(x_ref, qw_ref, scale_ref, o_ref, acc_ref, *, nk, gpb):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)
    bm, BK = x.shape
    bn = qw_ref.shape[1]
    half = INT4_GROUP_SIZE // 2
    g = BK // INT4_GROUP_SIZE
    # per-(row, chunk) activation scale
    xs = jnp.max(jnp.abs(x), axis=1, keepdims=True) / 127.0  # [bm, 1]
    xq = jnp.round(x / xs).astype(jnp.int8)
    low, high = _unpack_planes(qw_ref[:].astype(jnp.int32), jnp.int8)
    w = jnp.concatenate(
        [low.reshape(g, half, bn), high.reshape(g, half, bn)], axis=1
    )  # [g, 128, bn] int8
    xg = xq.reshape(bm, g, INT4_GROUP_SIZE).transpose(1, 0, 2)  # [g, bm, 128]
    yg = jax.lax.dot_general(
        xg, w, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32
    )  # [g, bm, bn] int32
    sc = scale_ref[pl.ds(k * gpb, gpb), :].astype(jnp.float32)  # [g, bn]
    acc_ref[:] += jnp.sum(yg.astype(jnp.float32) * sc.reshape(g, 1, bn), axis=0) * xs

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _call_variant(kernel, x, qw, scale, K, N, bn, BK):
    bm = x.shape[0]
    nk = K // BK
    gpb = BK // INT4_GROUP_SIZE
    g = scale.shape[0]
    return pl.pallas_call(
        functools.partial(kernel, nk=nk, gpb=gpb),
        grid=(x.shape[0] // bm, N // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, BK), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK // 2, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x, qw, scale)


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
        default="stream,cur,hi3,u16,u16l",
        help="comma list from stream,cur,d128,fold,w4a8,hi3,u16,u16l,int8,bf16",
    )
    ap.add_argument("--bk", type=int, default=0, help="override k-chunk")
    ap.add_argument("--bn", type=int, default=0, help="override n-tile")
    args = ap.parse_args()
    want = set(args.variants.split(","))
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
        x = jnp.asarray(rng.standard_normal((BM, K)) * 0.1, jnp.bfloat16)
        qwd = jnp.asarray(packed)
        scd = jnp.asarray(scales)
        p4 = QuantLinear(qwd, scd, None, "int4", K, N)
        p8 = QuantLinear(jnp.asarray(q8), jnp.asarray(s8), None, "int8", K, N)
        wbf = jnp.asarray(w, jnp.bfloat16)

        i4bytes = K * N // 2 + (K // INT4_GROUP_SIZE) * N * 4
        floor_ms = i4bytes / (HBM_GBPS * 1e9) * 1e3

        BK = args.bk or (2048 if K > 8192 else K)
        # bn chosen to fit VMEM for the fattest variant (fold: f32 temps)
        bn = args.bn or (128 if BK >= 2048 else 256)

        shape_reps = args.reps or reps_for(floor_ms)
        qob = jnp.asarray(repack_offset_binary(packed))
        qmx = jnp.asarray(repack_mixed(packed))

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
        for tag, kern, qarg in (
            ("d128", _d128_kernel, qwd),
            ("fold", _fold_kernel, qwd),
            ("w4a8", _w4a8_kernel, qwd),
            ("hi3", _hi3_kernel, qwd),
            ("u16", _u16_kernel, qob),
            ("u16l", _u16l_kernel, qob),
            ("cvt", _cvt_kernel, qmx),
            ("cvtl", _cvtl_kernel, qmx),
        ):
            if tag not in want:
                continue
            try:
                results[tag] = bench(
                    lambda x_, qw_, sc_, kern=kern: _call_variant(kern, x_, qw_, sc_, K, N, bn, BK),
                    (x, qarg, scd), shape_reps, tag,
                )
            except Exception as e:  # noqa: BLE001
                print(f"{name}/{tag} FAILED: {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
                results[tag] = float("nan")
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
            print(f"  {tag:7s} {tot:7.2f}ms  fraction={layer_floor/tot:.3f}  tok/s@{BM}={BM/tot*1e3:,.0f}")


if __name__ == "__main__":
    main()
