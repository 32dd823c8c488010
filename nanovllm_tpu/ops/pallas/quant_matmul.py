"""Fused weight-dequant + matmul Pallas kernels (INT8 per-channel, INT4
per-group).

Why a kernel at all: weight-only quantization's win is HBM bandwidth — the
kernel streams 1-byte (or half-byte) weights from HBM and dequantizes in VMEM
right before feeding the MXU, so a bf16 copy of the weights never exists in
HBM. The XLA fallback (dequantize-then-dot) materializes it and
doubles/quadruples weight traffic — exactly what memory-bound decode can't
afford.

Layouts (see ops/quant.py):
  INT8: qw [K, N] int8, scale [N] f32 per out-channel.
  INT4: qw [K/2, N] int8 — within each 128-row group, row r (low nibble)
        pairs with row r+64 (high nibble) so in-kernel unpack is a contiguous
        concat along sublanes; scale [K/128, N] f32 per (group, channel).
K and N are pre-padded to multiples of 128 at load time (QuantLinear).

Scheduling: decode matmuls are skinny (M = batch lanes ≤ 256) and
memory-bound, so per-grid-step work must be large enough to hide DMA latency.
When the whole contraction dim fits in VMEM (K ≤ K_RESIDENT) the grid is just
(M/bm, N/bn) with one big dot per step and no accumulator carry; for larger K
we split with a coarse BK and accumulate in VMEM scratch. Mosaic note: int8
vector shifts don't legalize — INT4 unpacking runs in int32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanovllm_tpu.ops.quant import INT4_GROUP_SIZE, QuantLinear

K_RESIDENT = 8192  # max contraction dim kept fully in VMEM per grid step
BK_SPLIT = 2048    # k-split chunk for very large K
_INTERPRET = False  # flipped by tests on CPU


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


VMEM_BUDGET = 11 << 20  # leave headroom under the 16MB scoped-vmem limit


def _vmem_cost(bm: int, bn: int, keff: int, is4: bool, split: bool) -> int:
    """Rough scoped-VMEM bytes for one grid step: double-buffered x and
    weight blocks, the in-kernel dequant intermediates (bf16 cast for INT8;
    int32 nibble temps + one bf16 copy + f32 per-group accumulator for
    INT4), the output block and the k-split accumulator."""
    x = 2 * bm * keff * 2
    wq = 2 * (keff // 2 if is4 else keff) * bn
    if is4:
        dq = (4 + 2) * keff * bn + 4 * bm * bn * (keff // INT4_GROUP_SIZE)
    else:
        dq = 2 * keff * bn
    out = 2 * bm * bn * 4 + (bm * bn * 4 if split else 0)
    return x + wq + dq + out


def _plan(m: int, K: int, N: int, is4: bool) -> tuple[bool, int, int]:
    """Choose (resident, bm, bn) maximizing tile sizes within VMEM_BUDGET."""
    bm_cap = 16
    while bm_cap < m and bm_cap < 256:
        bm_cap *= 2
    options = ([True] if K <= K_RESIDENT else []) + [False]
    for resident in options:
        keff = K if resident else min(BK_SPLIT, K)
        for bn in (512, 256, 128):
            if N % bn:
                continue
            bm = bm_cap
            while bm >= 16:
                if _vmem_cost(bm, bn, keff, is4, not resident) <= VMEM_BUDGET:
                    return resident, bm, bn
                bm //= 2
    return False, 16, 128


def _pad_rows(x: jnp.ndarray, bm: int) -> jnp.ndarray:
    pad = (-x.shape[0]) % bm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


def _unpack_int4(p: jnp.ndarray, dtype) -> jnp.ndarray:
    """[rows, bn] packed int8 -> [2*rows, bn] dtype, group-paired layout.
    rows must be a multiple of half-group (64)."""
    half = INT4_GROUP_SIZE // 2
    rows, bn = p.shape
    g = rows // half
    p32 = p.astype(jnp.int32)
    low = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    high = jnp.right_shift(jnp.left_shift(p32, 24), 28)
    w = jnp.concatenate(
        [low.reshape(g, half, bn), high.reshape(g, half, bn)], axis=1
    )
    return w.reshape(2 * rows, bn).astype(dtype)


# ---------------------------------------------------------------------------
# K-resident kernels: grid (M/bm, N/bn), one dot per step
# ---------------------------------------------------------------------------


def _int8_kernel_kres(x_ref, qw_ref, scale_ref, o_ref):
    w = qw_ref[:].astype(x_ref.dtype)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = acc * scale_ref[:].astype(jnp.float32)


def _group_dot(x, packed, scale, dtype):
    """Fused int4 unpack + per-group matmul, scale applied to the
    ACCUMULATOR: out = sum_g (xl_g @ L_g + xh_g @ H_g) * s_g.

    The group-paired packing (row r low nibble / row r+64 high nibble of the
    same byte row) means each packed row block [g*64, (g+1)*64) IS the low-
    and high-half weight rows of group g — so instead of unpacking into a
    contiguous [K, bn] copy (a sublane-concat relayout per tile), the dot is
    split into two 64-deep halves against the nibble planes directly. VPU
    work per packed byte: 1 widening cast + 4 shifts + 2 bf16 casts — no
    concat, no f32 weight copy, no [K, bn] scale multiply (the per-group
    scale hits the [bm, bn] accumulator)."""
    bm, K = x.shape
    bn = packed.shape[1]
    g = K // INT4_GROUP_SIZE
    half = INT4_GROUP_SIZE // 2
    p32 = packed.astype(jnp.int32)
    low = jnp.right_shift(jnp.left_shift(p32, 28), 28).astype(dtype)   # [K/2, bn]
    high = jnp.right_shift(jnp.left_shift(p32, 24), 28).astype(dtype)
    sc = scale.astype(jnp.float32)
    acc = None
    for gi in range(g):
        lo = gi * INT4_GROUP_SIZE
        part = (
            jnp.dot(x[:, lo:lo + half], low[gi * half:(gi + 1) * half, :],
                    preferred_element_type=jnp.float32)
            + jnp.dot(x[:, lo + half:lo + INT4_GROUP_SIZE],
                      high[gi * half:(gi + 1) * half, :],
                      preferred_element_type=jnp.float32)
        ) * sc[gi:gi + 1, :]
        acc = part if acc is None else acc + part
    return acc


def _int4_kernel_kres(x_ref, qw_ref, scale_ref, o_ref):
    o_ref[:] = _group_dot(x_ref[:], qw_ref[:], scale_ref[:], x_ref.dtype)


# ---------------------------------------------------------------------------
# K-split kernels: grid (M/bm, N/bn, K/BK) with VMEM accumulator
# ---------------------------------------------------------------------------


def _int8_kernel_ksplit(x_ref, qw_ref, scale_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:], qw_ref[:].astype(x_ref.dtype), preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:] * scale_ref[:].astype(jnp.float32)


def _int4_kernel_ksplit(x_ref, qw_ref, scale_ref, o_ref, acc_ref, *, nk: int, gpb: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    sc = scale_ref[pl.ds(k * gpb, gpb), :]  # this chunk's groups
    acc_ref[:] += _group_dot(x_ref[:], qw_ref[:], sc, x_ref.dtype)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


def _common(M, N, K, mode):
    flops = 2 * M * N * K
    wbytes = K * N * (1 if mode == "int8" else 0.5)
    return pl.CostEstimate(
        flops=flops, bytes_accessed=int(M * K * 2 + wbytes + M * N * 4), transcendentals=0
    )


def quant_matmul(x: jnp.ndarray, p: QuantLinear) -> jnp.ndarray:
    """x [M, n_in] -> [M, n_out] fp32."""
    M = x.shape[0]
    is4 = p.mode == "int4"
    K = p.qw.shape[0] * (2 if is4 else 1)
    N = p.qw.shape[1]
    kbytes = K if not is4 else K // 2
    resident, bm, bn = _plan(M, K, N, is4)
    xp = _pad_rows(x, bm)
    if K != x.shape[1]:
        xp = jnp.pad(xp, ((0, 0), (0, K - x.shape[1])))
    Mp = xp.shape[0]
    scale2d = p.scale.reshape(1, -1) if not is4 else p.scale
    g = scale2d.shape[0]

    if resident:
        grid = (Mp // bm, N // bn)
        kernel = _int8_kernel_kres if not is4 else _int4_kernel_kres
        y = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((kbytes, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, bn) if is4 else (1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            cost_estimate=_common(Mp, N, K, p.mode),
            interpret=_INTERPRET,
        )(xp, p.qw, scale2d)
    else:
        BK = BK_SPLIT
        nk = K // BK if K % BK == 0 else None
        if nk is None:
            BK = INT4_GROUP_SIZE if is4 else 128
            nk = K // BK
        gpb = BK // INT4_GROUP_SIZE
        grid = (Mp // bm, N // bn, nk)
        if is4:
            kernel = functools.partial(_int4_kernel_ksplit, nk=nk, gpb=gpb)
            scale_spec = pl.BlockSpec((g, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM)
        else:
            kernel = functools.partial(_int8_kernel_ksplit, nk=nk)
            scale_spec = pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM)
        y = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, BK), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (BK // 2 if is4 else BK, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM
                ),
                scale_spec,
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=_common(Mp, N, K, p.mode),
            interpret=_INTERPRET,
        )(xp, p.qw, scale2d)
    return y[:M, : p.n_out]
