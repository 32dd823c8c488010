"""Pallas grouped-RMW row writer for the paged KV pool (decode hot path).

XLA lowers the decode KV append (`pool.at[rows].set(vals)`) to a
row-serialized scatter that read-modify-writes (8,128) tiles one update at a
time — profiled at ~91us per scatter on v5e, and decode runs 2 scatters x
num_layers per step (56% of device time on Llama-1B). Mosaic refuses
single-row DMAs into a 2D tiled HBM ref (slice sublane dim must be a multiple
of the 8-row tile), so this kernel read-modify-writes each lane's 8-row
ALIGNED TILE GROUP instead: DMA the [8, R] group to VMEM, blend the one new
row with a vectorized select, DMA it back. All B lanes' reads are issued
back-to-back and overlap, then one blend, then all writes.

CORRECTNESS PRECONDITION (caller-enforced, decode only): distinct in-bounds
rows must fall in distinct 8-row groups. Decode satisfies this structurally:
every lane is a different sequence, a sequence appends exactly one token per
step, and the BlockManager hands out whole blocks (block_size % 8 == 0) so an
8-row group never spans two sequences. Prefill chunks violate it (consecutive
slots share a group) and must use the XLA scatter path.

Rows >= total are padding/inactive lanes and are skipped (same 'drop'
convention as the scatter).

Shapes:
  k, v   [B, R]    values (already pool dtype; R = Hkv*D, R % 128 == 0)
  rows   [B] int32 flat pool row ids (scalar-prefetched for DMA indices and
                   replicated as a [B, 1] VMEM operand for the blend mask)
  pools  [total, R]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 8-row tile groups: the (8,128) base tile's sublane count. Verified on v5e
# for bf16/f32/int8 pools (int8's packed 32-row tile also accepts 8-row DMAs).
GROUP = 8

_INTERPRET = False


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


def _kernel(rows_ref, rows_v_ref, k_ref, v_ref, kpool_ref, vpool_ref,
            ko_ref, vo_ref, kgrp, vgrp, sems, *, total: int):
    B = k_ref.shape[0]
    G = GROUP

    def rstart(b, _):
        row = rows_ref[b]

        @pl.when(row < total)
        def _():
            g = pl.multiple_of((row // G) * G, G)
            pltpu.make_async_copy(ko_ref.at[pl.ds(g, G), :], kgrp.at[b], sems.at[b, 0]).start()
            pltpu.make_async_copy(vo_ref.at[pl.ds(g, G), :], vgrp.at[b], sems.at[b, 1]).start()

        return None

    jax.lax.fori_loop(0, B, rstart, None)

    def rwait(b, _):
        row = rows_ref[b]

        @pl.when(row < total)
        def _():
            pltpu.make_async_copy(kgrp.at[b], kgrp.at[b], sems.at[b, 0]).wait()
            pltpu.make_async_copy(vgrp.at[b], vgrp.at[b], sems.at[b, 1]).wait()

        return None

    jax.lax.fori_loop(0, B, rwait, None)

    rows_v = rows_v_ref[...].reshape(B, 1, 1)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (B, G, 1), 1) == rows_v % G) & (rows_v < total)
    kgrp[...] = jnp.where(sel, k_ref[...].reshape(B, 1, -1), kgrp[...])
    vgrp[...] = jnp.where(sel, v_ref[...].reshape(B, 1, -1), vgrp[...])

    def wstart(b, _):
        row = rows_ref[b]

        @pl.when(row < total)
        def _():
            g = pl.multiple_of((row // G) * G, G)
            pltpu.make_async_copy(kgrp.at[b], ko_ref.at[pl.ds(g, G), :], sems.at[b, 0]).start()
            pltpu.make_async_copy(vgrp.at[b], vo_ref.at[pl.ds(g, G), :], sems.at[b, 1]).start()

        return None

    jax.lax.fori_loop(0, B, wstart, None)

    def wwait(b, _):
        row = rows_ref[b]

        @pl.when(row < total)
        def _():
            g = pl.multiple_of((row // G) * G, G)
            pltpu.make_async_copy(kgrp.at[b], ko_ref.at[pl.ds(g, G), :], sems.at[b, 0]).wait()
            pltpu.make_async_copy(vgrp.at[b], vo_ref.at[pl.ds(g, G), :], sems.at[b, 1]).wait()

        return None

    jax.lax.fori_loop(0, B, wwait, None)


def kv_write_rows(
    kpool: jnp.ndarray,  # [total, R]
    vpool: jnp.ndarray,
    k: jnp.ndarray,      # [B, R] (pool dtype)
    v: jnp.ndarray,
    rows: jnp.ndarray,   # [B] int32, >= total => skip
) -> tuple[jnp.ndarray, jnp.ndarray]:
    B, R = k.shape
    total = kpool.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda i, s: (0, 0)),
            pl.BlockSpec((B, R), lambda i, s: (0, 0)),
            pl.BlockSpec((B, R), lambda i, s: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, GROUP, R), kpool.dtype),
            pltpu.VMEM((B, GROUP, R), vpool.dtype),
            pltpu.SemaphoreType.DMA((B, 2)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, total=total),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(kpool.shape, kpool.dtype),
            jax.ShapeDtypeStruct(vpool.shape, vpool.dtype),
        ],
        # Indices count the flattened operands incl. the scalar-prefetch arg:
        # (rows, rows_v, k, v, kpool, vpool) -> kpool is input 4 -> output 0.
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(rows, rows.reshape(B, 1), k.astype(kpool.dtype), v.astype(vpool.dtype), kpool, vpool)
