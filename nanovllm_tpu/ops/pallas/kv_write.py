"""Pallas row-writer for the paged KV pool (decode hot path).

XLA lowers the per-layer decode KV append (`pool.at[rows].set(vals)`) to a
row-serialized scatter that read-modify-writes (8,128) tiles one update at a
time — profiled at ~91us per scatter on v5e, and decode runs 2 scatters x
num_layers per step (56% of device time on Llama-1B; the quantized pool
doubles it with scale scatters). This kernel replaces the scatter with B
direct VMEM->HBM row DMAs (one per decode lane) issued back-to-back and
overlapped, with the pool aliased input->output so nothing else moves.

Only rows < total are written: the caller encodes padding/inactive lanes as
OOB row ids (the same 'drop' convention the scatter used).

Shapes:
  values     [B, Hkv*D]   (bf16/f32/int8 — matches pool dtype)
  rows       [B] int32    flat pool row ids (scalar-prefetched)
  pool       [total, Hkv*D]
  scales     [B, Hkv] f32 + scale pool [Hkv, total] (INT8 KV only; written
             as [Hkv, 1] column DMAs)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


def _kernel(rows_ref, k_ref, v_ref, kpool_ref, vpool_ref, ko_ref, vo_ref, sems,
            *, total: int):
    B = k_ref.shape[0]

    def body(b, _):
        row = rows_ref[b]

        @pl.when(row < total)
        def _():
            pltpu.make_async_copy(
                k_ref.at[pl.ds(b, 1), :], ko_ref.at[pl.ds(row, 1), :], sems.at[b, 0]
            ).start()
            pltpu.make_async_copy(
                v_ref.at[pl.ds(b, 1), :], vo_ref.at[pl.ds(row, 1), :], sems.at[b, 1]
            ).start()

        return None

    jax.lax.fori_loop(0, B, body, None)

    def wait(b, _):
        row = rows_ref[b]

        @pl.when(row < total)
        def _():
            pltpu.make_async_copy(
                k_ref.at[pl.ds(b, 1), :], ko_ref.at[pl.ds(row, 1), :], sems.at[b, 0]
            ).wait()
            pltpu.make_async_copy(
                v_ref.at[pl.ds(b, 1), :], vo_ref.at[pl.ds(row, 1), :], sems.at[b, 1]
            ).wait()

        return None

    jax.lax.fori_loop(0, B, wait, None)


def _kernel_scales(rows_ref, ks_ref, vs_ref, kspool_ref, vspool_ref,
                   kso_ref, vso_ref, sems, *, total: int):
    B = ks_ref.shape[1]  # [Hkv, B]

    def body(b, _):
        row = rows_ref[b]

        @pl.when(row < total)
        def _():
            pltpu.make_async_copy(
                ks_ref.at[:, pl.ds(b, 1)], kso_ref.at[:, pl.ds(row, 1)], sems.at[b, 0]
            ).start()
            pltpu.make_async_copy(
                vs_ref.at[:, pl.ds(b, 1)], vso_ref.at[:, pl.ds(row, 1)], sems.at[b, 1]
            ).start()

        return None

    jax.lax.fori_loop(0, B, body, None)

    def wait(b, _):
        row = rows_ref[b]

        @pl.when(row < total)
        def _():
            pltpu.make_async_copy(
                ks_ref.at[:, pl.ds(b, 1)], kso_ref.at[:, pl.ds(row, 1)], sems.at[b, 0]
            ).wait()
            pltpu.make_async_copy(
                vs_ref.at[:, pl.ds(b, 1)], vso_ref.at[:, pl.ds(row, 1)], sems.at[b, 1]
            ).wait()

        return None

    jax.lax.fori_loop(0, B, wait, None)


def kv_write_rows(
    kpool: jnp.ndarray,  # [total, Hkv*D]
    vpool: jnp.ndarray,
    k: jnp.ndarray,      # [B, Hkv*D] (pool dtype)
    v: jnp.ndarray,
    rows: jnp.ndarray,   # [B] int32, >= total => skip
) -> tuple[jnp.ndarray, jnp.ndarray]:
    B = k.shape[0]
    total = kpool.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((B, 2))],
    )
    return pl.pallas_call(
        functools.partial(_kernel, total=total),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(kpool.shape, kpool.dtype),
            jax.ShapeDtypeStruct(vpool.shape, vpool.dtype),
        ],
        # Indices count the flattened operands incl. the scalar-prefetch arg:
        # (rows, k, v, kpool, vpool) -> kpool is input 3 -> output 0.
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(rows, k.astype(kpool.dtype), v.astype(vpool.dtype), kpool, vpool)


def kv_write_scales(
    kspool: jnp.ndarray,  # [Hkv, total] f32
    vspool: jnp.ndarray,
    ks: jnp.ndarray,      # [Hkv, B] f32
    vs: jnp.ndarray,
    rows: jnp.ndarray,    # [B] int32
) -> tuple[jnp.ndarray, jnp.ndarray]:
    B = ks.shape[1]
    total = kspool.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((B, 2))],
    )
    return pl.pallas_call(
        functools.partial(_kernel_scales, total=total),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(kspool.shape, kspool.dtype),
            jax.ShapeDtypeStruct(vspool.shape, vspool.dtype),
        ],
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(rows, ks, vs, kspool, vspool)
