"""Fused weight-dequant + matmul Pallas kernels (INT8 per-channel, INT4
per-group).

Why a kernel at all: weight-only quantization's win is HBM bandwidth — the
kernel streams 1-byte (or half-byte) weights from HBM and dequantizes in VMEM
registers right before feeding the MXU, so the bf16 weight tensor never
exists in HBM. The XLA fallback (dequantize-then-dot) materializes it and
doubles/quadruples weight traffic — exactly what decode, being memory-bound,
cannot afford.

Layouts (see ops/quant.py):
  INT8: qw [K, N] int8, scale [N] f32 per out-channel.
  INT4: qw [K/2, N] int8 — within each 128-row group, row r (low nibble)
        pairs with row r+64 (high nibble) so in-kernel unpack is a contiguous
        concat along sublanes; scale [K/128, N] f32 per (group, channel).
K and N are pre-padded to multiples of 128 at load time (QuantLinear).

Grid: (M/BM, N/BN, K/BK) with BK = 128 = one INT4 group per step; fp32
accumulation in VMEM scratch, scales applied at the final write (INT8) or per
group-step (INT4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanovllm_tpu.ops.quant import INT4_GROUP_SIZE, QuantLinear

BK = 128
BN = 256
_INTERPRET = False  # flipped by tests on CPU


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


def _bn_for(n: int) -> int:
    # N is pre-padded to a multiple of 128; prefer 256-wide tiles when they
    # divide evenly.
    return BN if n % BN == 0 else 128


def _bm_for(m: int) -> int:
    if m >= 256:
        return 256
    b = 16
    while b < m:
        b *= 2
    return b


def _pad_rows(x: jnp.ndarray, bm: int) -> jnp.ndarray:
    pad = (-x.shape[0]) % bm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


# ---------------------------------------------------------------------------
# INT8
# ---------------------------------------------------------------------------


def _int8_kernel(x_ref, qw_ref, scale_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = qw_ref[:].astype(x_ref.dtype)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:] * scale_ref[:].astype(jnp.float32)


def _int8_call(x: jnp.ndarray, qw: jnp.ndarray, scale2d: jnp.ndarray, bm: int) -> jnp.ndarray:
    M, K = x.shape
    N = qw.shape[1]
    bn = _bn_for(N)
    grid = (M // bm, N // bn, K // BK)
    return pl.pallas_call(
        functools.partial(_int8_kernel, nk=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, BK), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K, bytes_accessed=M * K * 2 + K * N + M * N * 4, transcendentals=0
        ),
        interpret=_INTERPRET,
    )(x, qw, scale2d)


# ---------------------------------------------------------------------------
# INT4
# ---------------------------------------------------------------------------


def _int4_kernel(x_ref, qw_ref, scale_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = qw_ref[:]  # [BK//2, bn] packed: this k-step's whole group
    low = jnp.right_shift(jnp.left_shift(p, 4), 4)
    high = jnp.right_shift(p, 4)
    w = jnp.concatenate([low, high], axis=0).astype(x_ref.dtype)  # [BK, bn]
    part = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    acc_ref[:] += part * scale_ref[:].astype(jnp.float32)  # per-group scale row

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _int4_call(x: jnp.ndarray, qw: jnp.ndarray, scales: jnp.ndarray, bm: int) -> jnp.ndarray:
    M, K = x.shape
    N = qw.shape[1]
    bn = _bn_for(N)
    half = INT4_GROUP_SIZE // 2
    grid = (M // bm, N // bn, K // INT4_GROUP_SIZE)
    return pl.pallas_call(
        functools.partial(_int4_kernel, nk=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, INT4_GROUP_SIZE), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((half, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K, bytes_accessed=M * K * 2 + K * N // 2 + M * N * 4, transcendentals=0
        ),
        interpret=_INTERPRET,
    )(x, qw, scales)


# ---------------------------------------------------------------------------
# Entry
# ---------------------------------------------------------------------------


def quant_matmul(x: jnp.ndarray, p: QuantLinear) -> jnp.ndarray:
    """x [M, n_in] -> [M, n_out] fp32."""
    M = x.shape[0]
    K_pad = p.qw.shape[0] * (2 if p.mode == "int4" else 1)
    bm = _bm_for(M)
    xp = _pad_rows(x, bm)
    if K_pad != x.shape[1]:
        xp = jnp.pad(xp, ((0, 0), (0, K_pad - x.shape[1])))
    if p.mode == "int8":
        y = _int8_call(xp, p.qw, p.scale.reshape(1, -1), bm)
    else:
        y = _int4_call(xp, p.qw, p.scale, bm)
    return y[:M, : p.n_out]
