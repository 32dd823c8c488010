"""Burst-stash flush as a Pallas window-merge kernel.

The XLA formulation of the once-per-burst KV flush (models/model.py
`flush_burst_stash`) scatters L*J*B individual pool rows; XLA lowers that
row-serialized — measured **12.75 ms per burst** at the Llama-1B bench shape
(16 layers x 32 steps x 64 lanes), ~0.4 ms/decode-step of pure scatter
overhead (r5 xprof anatomy, docs/PERFORMANCE.md).

Key structure the scatter can't see: a lane's burst rows are CONTIGUOUS in
position, so within one layer they cover at most two aligned J-row windows
of the paged pool (J = burst steps <= block_size, block_size % J == 0; the
window never straddles a page boundary). This kernel grids over
(lane, layer, window), reads the window's current rows + the lane's stash
rows, merges via a branch-free one-hot [J, J] dot (no dynamic-size DMAs),
and writes the window back — static shapes throughout, in-place on the
donated pool via input_output_aliases. Traffic: ~3 J-row windows per
(lane, layer) pair instead of a full pool rewrite.

Safety invariants (why arbitrary window routing is sound):
  - physical block 0 is RESERVED by the BlockManager (never allocated), so
    inactive lanes — whose block tables are zero — route their windows at
    block 0 and write back its (unused) contents without racing any live
    lane's merge;
  - a lane whose burst stays inside one window duplicates window 0 as
    window 1: both grid steps compute identical merged contents, so the
    write-write/stale-read overlap is benign;
  - distinct lanes hold disjoint physical blocks (BlockManager invariant),
    so no two grid steps target the same window with different contents.
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


def flush_supported(n_steps: int, block_size: int, pool: dict) -> bool:
    """Kernel preconditions; callers fall back to the XLA scatter otherwise.
    INT8 pools keep the XLA path (per-row scale quantization doesn't fit the
    window-merge formulation cheaply). n_steps >= 8: the window blocks'
    second-minor dim must be a sublane multiple."""
    return (
        pool["k"].dtype != jnp.int8
        and 8 <= n_steps <= block_size
        and block_size % n_steps == 0
    )


def _kernel(
    # scalar prefetch
    chunk_ref,   # [B, 2] int32 absolute layer-0 row-chunk index per window
    p0_ref,      # [B] int32 burst-start positions
    keep_ref,    # [B] int32 lane-active flags
    # inputs
    stash_k_ref,  # [1, 1, J, HD] this (layer, lane)'s stash rows
    stash_v_ref,
    old_k_ref,    # [J, HD] current pool window contents
    old_v_ref,
    # outputs
    out_k_ref,    # [J, HD] merged window
    out_v_ref,
    *,
    J: int,
    max_positions: int,
):
    b = pl.program_id(1)
    w = pl.program_id(2)
    p0 = p0_ref[b]
    s1 = p0 % J  # stash row 0's offset inside window 0
    # A duplicated window (chunk[b,1] == chunk[b,0]: the burst fits inside
    # one window) is visited twice, and the second visit may read the
    # window's PRE-first-visit contents (revolving input buffers prefetch
    # ahead of output writes) — so it must recompute the FIRST visit's merge
    # exactly, not its own (empty) one, to write identical bytes.
    w_eff = jnp.where((w == 1) & (chunk_ref[b, 1] == chunk_ref[b, 0]), 0, w)
    # Window row i holds position A_w + i; stash row j holds position p0 + j:
    # row i takes stash row j = i + w*J - s1 when it exists and is kept.
    ii = jax.lax.broadcasted_iota(jnp.int32, (J, J), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (J, J), 1)
    match = jj == ii + (w_eff * J - s1)
    keep = (keep_ref[b] > 0) & (p0 + jj < max_positions)
    oh = (match & keep).astype(jnp.float32)  # [J(row), J(stash)]
    covered = jnp.sum(oh, axis=1, keepdims=True) > 0  # [J, 1]

    for stash_ref, old_ref, out_ref in (
        (stash_k_ref, old_k_ref, out_k_ref),
        (stash_v_ref, old_v_ref, out_v_ref),
    ):
        stash = stash_ref[0, 0].astype(jnp.float32)  # [J, HD]
        merged = jax.lax.dot_general(
            oh, stash, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        out_ref[...] = jnp.where(
            covered, merged.astype(out_ref.dtype), old_ref[...]
        )


def flush_burst_stash_pallas(
    pool: dict,
    stash: dict,                # {k, v: [L, J, B, HD]} (or lane-major, below)
    block_tables: jnp.ndarray,  # [B, nb] int32
    positions0: jnp.ndarray,    # [B] int32 position of the burst's FIRST token
    active: jnp.ndarray,        # [B] bool
    block_size: int,
    max_positions: int,
    lane_major: bool = False,   # stash already [L, B, J, HD]
) -> dict:
    """Drop-in replacement for models.model.flush_burst_stash (bf16/f32
    pools). Writes every kept stash row into its pool slot; other pool rows
    are untouched. A step-major carry-layout stash is transposed lane-major
    ONCE here (one small copy per burst — a lane-major carry instead costs
    XLA per-(layer, step) relayout copies on every attention read); bhjd
    carries arrive pre-transposed (lane_major=True)."""
    if lane_major:
        L, B, J, HD = stash["k"].shape
        stash_k, stash_v = stash["k"], stash["v"]
    else:
        L, J, B, HD = stash["k"].shape
        stash_k = jnp.swapaxes(stash["k"], 1, 2)  # [L, B, J, HD]
        stash_v = jnp.swapaxes(stash["v"], 1, 2)
    bs = block_size
    total = pool["k"].shape[0]
    nslots = total // L
    nb = block_tables.shape[1]
    num_blocks = nslots // bs
    cpb = bs // J  # row-chunks per block

    p0 = positions0.astype(jnp.int32)
    a1 = (p0 // J) * J  # aligned start position of window 0
    keep_any = active & (p0 < max_positions)

    def win_chunk(apos):
        """Absolute (layer-0) row-chunk index of the window whose aligned
        start position is `apos`; block 0 (reserved) when unusable."""
        blk_idx = jnp.clip(apos // bs, 0, nb - 1)
        blk = jnp.take_along_axis(block_tables, blk_idx[:, None], axis=1)[:, 0]
        sub = (apos % bs) // J
        return blk * cpb + sub

    c0 = jnp.where(keep_any, win_chunk(a1), 0)
    # Window 1 exists iff the burst crosses the alignment boundary (s1 > 0)
    # and at least one crossing row is kept; otherwise duplicate window 0.
    s1 = p0 % J
    w1_live = keep_any & (s1 > 0) & (a1 + J < max_positions)
    c1 = jnp.where(w1_live, win_chunk(a1 + J), c0)
    chunks = jnp.stack([c0, c1], axis=1).astype(jnp.int32)  # [B, 2]

    # Lane-major stash [L, B, J, HD]: each grid step fetches one (layer,
    # lane)'s [J, HD] rows — minor dims (J, HD) satisfy TPU tiling (J >= 8),
    # and the fetch is pipelined by the automatic revolving buffers.
    grid = (L, B, 2)
    nspec = pl.BlockSpec(
        (1, 1, J, HD), lambda l, b, w, *refs: (l, b, 0, 0)
    )

    def pool_idx(l, b, w, chunk_ref, p0_ref, keep_ref):
        return (l * (num_blocks * cpb) + chunk_ref[b, w], 0)

    pool_spec = pl.BlockSpec((J, HD), pool_idx)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[nspec, nspec, pool_spec, pool_spec],
        out_specs=[pool_spec, pool_spec],
    )
    out_k, out_v = pl.pallas_call(
        functools.partial(_kernel, J=J, max_positions=max_positions),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(pool["k"].shape, pool["k"].dtype),
            jax.ShapeDtypeStruct(pool["v"].shape, pool["v"].dtype),
        ],
        # pool k/v are operands 3 and 4 after the 3 scalar-prefetch args
        # (aliasing indices count scalars first), aliased to the two outputs.
        input_output_aliases={5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(
        chunks, p0, keep_any.astype(jnp.int32),
        stash_k, stash_v, pool["k"], pool["v"],
    )
    out = dict(pool)
    out["k"] = out_k
    out["v"] = out_v
    return out
