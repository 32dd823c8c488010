"""Once-per-burst context pregather as a Pallas page-copy kernel.

The XLA formulation (models/model.py `pregather_context`) is a row gather of
L*B*S pool rows; XLA lowers it row-serialized — measured ~73 GB/s
(7.3 ms/burst at the Llama-1B bench shape) plus, because the per-step
attention dots want the context S-minor, two full-size layout-change copies
(another 3.3 ms/burst). A sequence's context pages are CONTIGUOUS bs-row
runs of the pool, so this kernel grids over (layer, lane, page) and moves
whole pages through VMEM — page-sized DMAs at stream bandwidth instead of
row gathers.

With transpose=True (default) each page is transposed in VMEM and the
output is [L, B, Hkv, D, S] — physically S-minor, exactly the layout the
per-step score/PV dots want — so the downstream layout copies disappear;
`ops/attention.attention_decode_stashed(ctx_layout="bhds")` consumes the
per-layer [B, Hkv, D, S] slice directly, with NO reshape between the kernel
output and the dots (a reshape there breaks XLA's slice fusion and
re-materializes every layer's slice per step — measured +1.4 ms/step).
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


def pregather_supported(pool: dict) -> bool:
    """INT8 pools keep the XLA gather+dequant path."""
    return pool["k"].dtype != jnp.int8


def _copy_kernel(bt_ref, k_in, v_in, k_out, v_out):
    k_out[0, 0] = k_in[...]
    v_out[0, 0] = v_in[...]


def _transpose_kernel(bt_ref, k_in, v_in, k_out, v_out, *, Hkv: int):
    bs, HD = k_in.shape
    D = HD // Hkv
    # [bs, HD] -> [HD, bs] -> split the sublane dim into (Hkv, D): free.
    k_out[0, 0] = k_in[...].T.reshape(Hkv, D, bs)
    v_out[0, 0] = v_in[...].T.reshape(Hkv, D, bs)


def pregather_context_pallas(
    pool: dict,
    block_tables: jnp.ndarray,  # [B, nb] int32
    block_size: int,
    num_layers: int,
    num_kv_heads: int = 1,
    transpose: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (k, v): [L, B, Hkv, D, S] when transpose else [L, B, S, HD].
    Padding block-table entries copy whichever page they name (callers mask
    by context length, exactly like the XLA gather)."""
    L = num_layers
    bs = block_size
    HD = pool["k"].shape[1]
    total = pool["k"].shape[0]
    nslots = total // L
    num_blocks = nslots // bs
    B, nb = block_tables.shape
    S = nb * bs
    dt = pool["k"].dtype

    def pool_idx(l, b, p, bt_ref):
        return (l * num_blocks + bt_ref[b, p], 0)

    pool_spec = pl.BlockSpec((bs, HD), pool_idx)
    if transpose:
        Hkv = num_kv_heads
        D = HD // Hkv
        out_spec = pl.BlockSpec(
            (1, 1, Hkv, D, bs), lambda l, b, p, *r: (l, b, 0, 0, p)
        )
        out_shape = jax.ShapeDtypeStruct((L, B, Hkv, D, S), dt)
        kern = functools.partial(_transpose_kernel, Hkv=Hkv)
    else:
        out_spec = pl.BlockSpec(
            (1, 1, bs, HD), lambda l, b, p, *r: (l, b, p, 0)
        )
        out_shape = jax.ShapeDtypeStruct((L, B, S, HD), dt)
        kern = _copy_kernel

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B, nb),
        in_specs=[pool_spec, pool_spec],
        out_specs=[out_spec, out_spec],
    )
    k, v = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[out_shape, out_shape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(block_tables.astype(jnp.int32), pool["k"], pool["v"])
    return k, v
