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
  INT4: qw [K/2, N] int8, HALVES packing — byte row r holds W[r] (low
        nibble, offset-binary) and W[K/2 + r] (high nibble, two's
        complement), so each nibble plane is a contiguous block of weight
        rows; scale [K/128, N] f32 per (128-row group, channel).
K and N are pre-padded at load time (QuantLinear; K to 256-multiples for
int4 so each half is whole groups, N per padded_out_dim).

Scheduling: decode matmuls are skinny (M = batch lanes ≤ 256) and
memory-bound, so per-grid-step work must be large enough to hide DMA latency.
When the whole contraction dim fits in VMEM (K ≤ K_RESIDENT) the grid is just
(M/bm, N/bn) with one big dot per step and no accumulator carry; for larger K
we split with a coarse BK and accumulate in VMEM scratch. Mosaic note:
sub-int32 vector SHIFTS don't legalize, but int8 AND and int8->bf16 converts
do — INT4 unpacking is therefore pure int8 mask+convert against the mixed
nibble encoding from ops/quant.py, and the halves layout makes every scale
group one depth-128 MXU dot with the scale applied on the f32 accumulator
(_halves_group_dot).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanovllm_tpu.ops.quant import INT4_GROUP_SIZE, QuantLinear

K_RESIDENT = 8192  # max contraction dim kept fully in VMEM per grid step
_INTERPRET = False  # flipped by tests on CPU


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


VMEM_BUDGET = 11 << 20  # leave headroom under the 16MB scoped-vmem limit


def _vmem_cost(bm: int, bn: int, keff: int, is4: bool, split: bool) -> int:
    """Rough scoped-VMEM bytes for one grid step: double-buffered x and
    weight blocks, the in-kernel dequant intermediates (bf16 cast for INT8;
    two bf16 nibble planes + f32 per-group partials for INT4), the output
    block and the k-split accumulator."""
    x = 2 * bm * keff * 2
    wq = 2 * (keff // 2 if is4 else keff) * bn
    if is4:
        # raw + scaled bf16 nibble planes (keff/2 rows each; Mosaic may fuse
        # the intermediate, budget 3x keff lane-bytes to be safe).
        dq = 3 * keff * bn
    else:
        dq = 2 * keff * bn
    out = 2 * bm * bn * 4 + (bm * bn * 4 if split else 0)
    return x + wq + dq + out


def _plan(m: int, K: int, N: int, is4: bool) -> tuple[bool, int, int, int]:
    """Choose (resident, bm, bn, bk) minimizing grid steps within VMEM_BUDGET.

    Grid-step count is what the fixed per-step overhead (~0.5us: semaphore
    waits + revolving-buffer bookkeeping) multiplies — at decode shapes the
    kernels are DMA-bound, so fewer/bigger blocks beat any in-kernel
    cleverness. Candidates are ordered by descending bytes per step."""
    bm_cap = 16
    while bm_cap < m and bm_cap < 256:
        bm_cap *= 2
    cands: list[tuple[bool, int, int]] = []  # (resident, bk, bn)
    for bn in (1024, 512, 256, 128):
        if N % bn:
            continue
        if K <= K_RESIDENT:
            cands.append((True, K, bn))
        for bk in (8192, 6144, 4608, 4096, 3072, 2048, 1024, 512, 256, 128):
            # int4 k-split chunks must hold whole groups from BOTH planes
            # AND slice the scale array at 8-row sublane multiples
            # ((bk/256) % 8 == 0 -> bk % 2048 == 0).
            if is4 and bk % 2048:
                continue
            if bk < K and K % bk == 0:
                cands.append((False, bk, bn))
    cands.sort(key=lambda c: c[1] * c[2], reverse=True)
    for resident, bk, bn in cands:
        bm = bm_cap
        while bm >= 16:
            if _vmem_cost(bm, bn, bk, is4, not resident) <= VMEM_BUDGET:
                return resident, bm, bn, bk
            bm //= 2
    return False, 16, 128, min(K, 256 if is4 else 128)


def _pad_rows(x: jnp.ndarray, bm: int) -> jnp.ndarray:
    pad = (-x.shape[0]) % bm
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


# ---------------------------------------------------------------------------
# K-resident kernels: grid (M/bm, N/bn), one dot per step
# ---------------------------------------------------------------------------


def _int8_kernel_kres(x_ref, qw_ref, scale_ref, o_ref):
    w = qw_ref[:].astype(x_ref.dtype)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = acc * scale_ref[:].astype(jnp.float32)


def _halves_group_dot(xl, xh, packed, sc_lo, sc_hi, dtype):
    """Fused int4 unpack + per-group depth-128 dots, scales applied to the
    [bm, bn] ACCUMULATOR (f32-exact — no per-weight multiply).

    The HALVES packing (byte row r: low nibble = W[r], high = W[K/2 + r])
    makes each nibble plane a contiguous block of weight rows, so every
    scale group is one [bm, 128] @ [128, bn] dot against one plane — half
    the dot count of the old 64-deep group-paired pairing (skinny-dot MXU
    issue overhead was the kernel's real cost; at decode widths it measured
    no faster than INT8 at half the bytes). xl/xh are the plain column
    halves of x, sliced upstream by BlockSpec index maps at zero cost.

    Unpack is pure int8 AND + int8->bf16 convert (Mosaic legalizes no
    sub-int32 shifts): low nibble offset-binary, high nibble two's
    complement with the /16 folded into its accumulator scale row.

    The unpack runs PER GROUP inside the loop (r4): a whole-tile upfront
    unpack is one big serial VPU phase before any dot; per-group chunks let
    Mosaic interleave VPU unpack with MXU dots — measured 0.541 -> 0.625 of
    the stream floor on the mlp_up shape (the kernels are otherwise
    DMA+unpack SERIALIZED; see docs/PERFORMANCE.md r4 anatomy)."""
    bm, Kh = xl.shape
    G = INT4_GROUP_SIZE
    gh = Kh // G  # groups per half
    sl = sc_lo.astype(jnp.float32)
    sh = sc_hi.astype(jnp.float32) * 0.0625
    acc = None
    for gi in range(gh):
        r = gi * G
        pk = packed[r:r + G, :]
        lo = jnp.bitwise_and(pk, jnp.int8(0x0F)).astype(dtype) - jnp.asarray(8.0, dtype)
        hi = jnp.bitwise_and(pk, jnp.int8(-16)).astype(dtype)  # == 16 * W_hi
        part = (
            jnp.dot(xl[:, r:r + G], lo, preferred_element_type=jnp.float32)
            * sl[gi:gi + 1, :]
            + jnp.dot(xh[:, r:r + G], hi, preferred_element_type=jnp.float32)
            * sh[gi:gi + 1, :]
        )
        acc = part if acc is None else acc + part
    return acc


def _int4_kernel_kres(xl_ref, xh_ref, qw_ref, scale_ref, o_ref, *, gpb: int):
    g2 = gpb // 2
    o_ref[:] = _halves_group_dot(
        xl_ref[:], xh_ref[:], qw_ref[:],
        scale_ref[pl.ds(0, g2), :], scale_ref[pl.ds(g2, g2), :],
        xl_ref.dtype,
    )


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


def _int4_kernel_ksplit(xl_ref, xh_ref, qw_ref, sclo_ref, schi_ref, o_ref, acc_ref, *, nk: int, gpb: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Chunk k's scale rows arrive pre-sliced by the BlockSpec index maps
    # (lo block k; hi block nk + k) — Mosaic rejects dynamic-start VMEM
    # slices keyed on the grid index, BlockSpecs do it in the DMA instead.
    acc_ref[:] += _halves_group_dot(
        xl_ref[:], xh_ref[:], qw_ref[:], sclo_ref[:], schi_ref[:], xl_ref.dtype
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


# ---------------------------------------------------------------------------
# Tiled-layout kernels (QuantLinear.layout == "tiled": qw [N/bn0, K/2, bn0]
# so every weight grid block is ONE contiguous HBM run — the [K/2, N]
# column-block slices DMA as K/2 strided bn-byte runs and measured only
# ~0.43-0.52 of the stream floor at Falcon decode shapes; contiguous tile
# blocks stream at ~0.87-0.91 in isolation, ~+6% on the full modeled step).
# Bodies are identical to the kn kernels — only the qw ref gains a leading
# tile axis.
# ---------------------------------------------------------------------------


def _int4_kernel_kres_tiled(xl_ref, xh_ref, qw_ref, scale_ref, o_ref, *, gpb: int):
    g2 = gpb // 2
    o_ref[:] = _halves_group_dot(
        xl_ref[:], xh_ref[:], qw_ref[0],
        scale_ref[pl.ds(0, g2), :], scale_ref[pl.ds(g2, g2), :],
        xl_ref.dtype,
    )


def _int4_kernel_ksplit_tiled(xl_ref, xh_ref, qw_ref, sclo_ref, schi_ref, o_ref, acc_ref, *, nk: int, gpb: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += _halves_group_dot(
        xl_ref[:], xh_ref[:], qw_ref[0], sclo_ref[:], schi_ref[:], xl_ref.dtype
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _plan_tiled(m: int, K: int, bn: int, is4: bool) -> tuple[bool, int, int]:
    """(resident, bm, bk) for the tiled layout — bn is fixed by the tile
    width, so the plan only picks the k-chunking and row block."""
    bm_cap = 16
    while bm_cap < m and bm_cap < 256:
        bm_cap *= 2
    cands: list[tuple[bool, int]] = []
    if K <= K_RESIDENT:
        cands.append((True, K))
    bks = (8192, 6144, 4096, 2048) if is4 else (8192, 6144, 4096, 2048, 1024, 512)
    for bk in bks:
        if bk < K and K % bk == 0:
            cands.append((False, bk))
    cands.sort(key=lambda c: c[1], reverse=True)
    for resident, bk in cands:
        bm = bm_cap
        while bm >= 16:
            if _vmem_cost(bm, bn, bk, is4, not resident) <= VMEM_BUDGET:
                return resident, bm, bk
            bm //= 2
    return (True, 16, K) if K <= K_RESIDENT else (False, 16, 2048)


def _int8_kernel_kres_tiled(x_ref, qw_ref, scale_ref, o_ref):
    w = qw_ref[0].astype(x_ref.dtype)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = acc * scale_ref[:].astype(jnp.float32)


def _int8_kernel_ksplit_tiled(x_ref, qw_ref, scale_ref, o_ref, acc_ref, *, nk: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:], qw_ref[0].astype(x_ref.dtype), preferred_element_type=jnp.float32
    )

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:] * scale_ref[:].astype(jnp.float32)


def _quant_matmul_int8_tiled(x: jnp.ndarray, p: QuantLinear) -> jnp.ndarray:
    T, K, bn = p.qw.shape
    N = T * bn
    M = x.shape[0]
    resident, bm, bk = _plan_tiled(M, K, bn, False)
    xp = _pad_rows(x, bm)
    if K != x.shape[1]:
        xp = jnp.pad(xp, ((0, 0), (0, K - x.shape[1])))
    Mp = xp.shape[0]
    scale2d = p.scale.reshape(1, -1)
    if resident:
        y = pl.pallas_call(
            _int8_kernel_kres_tiled,
            grid=(Mp // bm, T),
            in_specs=[
                pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K, bn), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
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
        BK = bk
        nk = K // BK
        y = pl.pallas_call(
            functools.partial(_int8_kernel_ksplit_tiled, nk=nk),
            grid=(Mp // bm, T, nk),
            in_specs=[
                pl.BlockSpec((bm, BK), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BK, bn), lambda i, j, k: (j, k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
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


def _quant_matmul_int4_tiled(x: jnp.ndarray, p: QuantLinear) -> jnp.ndarray:
    T, K2, bn = p.qw.shape
    K = K2 * 2
    N = T * bn
    M = x.shape[0]
    resident, bm, bk = _plan_tiled(M, K, bn, True)
    xp = _pad_rows(x, bm)
    if K != x.shape[1]:
        xp = jnp.pad(xp, ((0, 0), (0, K - x.shape[1])))
    Mp = xp.shape[0]
    scale2d = p.scale
    g = scale2d.shape[0]

    if resident:
        y = pl.pallas_call(
            functools.partial(_int4_kernel_kres_tiled, gpb=g),
            grid=(Mp // bm, T),
            in_specs=[
                pl.BlockSpec((bm, K // 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, K // 2), lambda i, j: (i, 1), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K // 2, bn), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            cost_estimate=_common(Mp, N, K, p.mode),
            interpret=_INTERPRET,
        )(xp, xp, p.qw, scale2d)
    else:
        BK = bk
        nk = K // BK
        gpb = BK // INT4_GROUP_SIZE
        y = pl.pallas_call(
            functools.partial(_int4_kernel_ksplit_tiled, nk=nk, gpb=gpb),
            grid=(Mp // bm, T, nk),
            in_specs=[
                pl.BlockSpec((bm, BK // 2), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                pl.BlockSpec((bm, BK // 2), lambda i, j, k, nk=nk: (i, nk + k), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BK // 2, bn), lambda i, j, k: (j, k, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((gpb // 2, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((gpb // 2, bn), lambda i, j, k, nk=nk: (nk + k, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=_common(Mp, N, K, p.mode),
            interpret=_INTERPRET,
        )(xp, xp, p.qw, scale2d, scale2d)
    return y[:M, : p.n_out]


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
    if getattr(p, "layout", "kn") == "tiled":
        return (_quant_matmul_int4_tiled if is4 else _quant_matmul_int8_tiled)(x, p)
    K = p.qw.shape[0] * (2 if is4 else 1)
    N = p.qw.shape[1]
    kbytes = K if not is4 else K // 2
    resident, bm, bn, bk = _plan(M, K, N, is4)
    xp = _pad_rows(x, bm)
    if K != x.shape[1]:
        xp = jnp.pad(xp, ((0, 0), (0, K - x.shape[1])))
    Mp = xp.shape[0]
    scale2d = p.scale.reshape(1, -1) if not is4 else p.scale
    g = scale2d.shape[0]

    if resident:
        grid = (Mp // bm, N // bn)
        if is4:
            # xl = x[:, :K/2], xh = x[:, K/2:] — sliced by BlockSpec index
            # maps on the SAME x operand (halves layout; zero-copy).
            y = pl.pallas_call(
                functools.partial(_int4_kernel_kres, gpb=g),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((bm, K // 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((bm, K // 2), lambda i, j: (i, 1), memory_space=pltpu.VMEM),
                    pl.BlockSpec((kbytes, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                    pl.BlockSpec((g, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                ),
                cost_estimate=_common(Mp, N, K, p.mode),
                interpret=_INTERPRET,
            )(xp, xp, p.qw, scale2d)
        else:
            y = pl.pallas_call(
                _int8_kernel_kres,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((kbytes, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
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
        BK = bk
        nk = K // BK
        gpb = BK // INT4_GROUP_SIZE
        grid = (Mp // bm, N // bn, nk)
        if is4:
            y = pl.pallas_call(
                functools.partial(_int4_kernel_ksplit, nk=nk, gpb=gpb),
                grid=grid,
                in_specs=[
                    # xl chunk k = x cols [k*BK/2, ...); xh chunk = the same
                    # offset in the second half, i.e. block index nk + k.
                    # Scale rows follow the same pattern (k*gq / g/2 + k*gq)
                    # — BlockSpec DMAs do the slicing; Mosaic rejects
                    # dynamic-start VMEM slices keyed on the grid index.
                    pl.BlockSpec((bm, BK // 2), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                    pl.BlockSpec((bm, BK // 2), lambda i, j, k, nk=nk: (i, nk + k), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BK // 2, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                    pl.BlockSpec((gpb // 2, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                    pl.BlockSpec((gpb // 2, bn), lambda i, j, k, nk=nk: (nk + k, j), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
                scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary"),
                ),
                cost_estimate=_common(Mp, N, K, p.mode),
                interpret=_INTERPRET,
            )(xp, xp, p.qw, scale2d, scale2d)
        else:
            y = pl.pallas_call(
                functools.partial(_int8_kernel_ksplit, nk=nk),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((bm, BK), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BK, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
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
