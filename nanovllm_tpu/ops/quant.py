"""Weight-only quantization: INT8 per-output-channel and INT4 per-group.

New capability relative to the reference (which computes everything in fp32
and has no quantization at all — docs/ARCHITECTURE_GUIDE.md:1599); mandated by
BASELINE.json (ΔPPL ≤0.1 @INT8, ≤0.5 @INT4 vs bf16).

Layout conventions (chosen for the Pallas fused dequant+matmul kernels in
ops/pallas/quant_matmul.py):
  - weights are stored [in_features, out_features] (same as our dense layout);
  - INT8: symmetric, per-output-channel scale [out];
  - INT4: symmetric, per-(group, out) scale [in/group, out], group along the
    *input* (contraction) dim so a kernel tile dequantizes with one scale row;
    two nibbles packed per int8 byte along the input dim — row 2i in the low
    nibble, row 2i+1 in the high nibble.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

INT4_GROUP_SIZE = 128


def _pad_to(x: np.ndarray, axis: int, mult: int) -> np.ndarray:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths)


import jax


@jax.tree_util.register_pytree_node_class
class QuantLinear:
    """Quantized linear weights with static true-shape metadata.

    Storage is padded to multiples of 128 on both dims (TPU lane/tile
    alignment for the Pallas kernels); `n_in`/`n_out` are the logical dims
    and live in the pytree's static aux data, so jitted code can slice
    without tracing them.

    mode == "int8": qw int8 [K_pad, N_pad], scale f32 [N_pad] (per-channel)
    mode == "int4": qw int8 [K_pad//2, N_pad] (2 nibbles/byte along K),
                    scale f32 [K_pad/group, N_pad] (per-group)
    """

    def __init__(self, qw, scale, b, mode: str, n_in: int, n_out: int):
        self.qw = qw
        self.scale = scale
        self.b = b
        self.mode = mode
        self.n_in = n_in
        self.n_out = n_out

    def tree_flatten(self):
        return (self.qw, self.scale, self.b), (self.mode, self.n_in, self.n_out)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qw, scale, b = children
        mode, n_in, n_out = aux
        return cls(qw, scale, b, mode, n_in, n_out)

    @classmethod
    def from_dense(cls, w: np.ndarray, b, mode: str) -> "QuantLinear":
        n_in, n_out = w.shape
        # Large contraction dims pad to a coarse multiple so the k-split
        # kernel gets big chunks (18176 would otherwise force 128-row steps).
        kmult = 2048 if n_in > 8192 else 128
        w = _pad_to(_pad_to(w, 0, kmult), 1, 128)
        if mode == "int8":
            qw, scale = quantize_int8(w)
        elif mode == "int4":
            qw, scale = quantize_int4(w)
        else:
            raise ValueError(mode)
        return cls(qw, scale, b, mode, n_in, n_out)

    def dequantize(self, dtype=jnp.float32) -> jnp.ndarray:
        if self.mode == "int8":
            w = dequantize_int8(self.qw, self.scale, dtype)
        else:
            w = dequantize_int4(self.qw, self.scale, self.qw.shape[0] * 2, dtype)
        return w[: self.n_in, : self.n_out]


def quantize_int8(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """w [in, out] float -> (qw int8 [in, out], scale f32 [out])."""
    w = np.asarray(w, dtype=np.float32)
    amax = np.max(np.abs(w), axis=0)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    qw = np.clip(np.rint(w / scale[None, :]), -127, 127).astype(np.int8)
    return qw, scale


def dequantize_int8(qw: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (qw.astype(jnp.float32) * scale[None, :].astype(jnp.float32)).astype(dtype)


def quantize_int4(w: np.ndarray, group_size: int = INT4_GROUP_SIZE) -> tuple[np.ndarray, np.ndarray]:
    """w [in, out] float -> (packed int8 [in//2, out], scales f32 [in//group, out]).

    Values are quantized to [-8, 7] with per-(group, out-channel) scales,
    groups along the input (contraction) dim. TPU-friendly packing: within
    each group of `group_size` rows, row r (low nibble) pairs with row
    r + group_size/2 (high nibble) — unpacking in a kernel is then a
    contiguous sublane concat, not an interleave.
    """
    w = np.asarray(w, dtype=np.float32)
    n_in, n_out = w.shape
    if n_in % group_size != 0:
        pad = group_size - n_in % group_size
        w = np.concatenate([w, np.zeros((pad, n_out), np.float32)], axis=0)
        n_in = w.shape[0]
    g = n_in // group_size
    half = group_size // 2
    wg = w.reshape(g, group_size, n_out)
    amax = np.max(np.abs(wg), axis=1)  # [g, out]
    scales = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(wg / scales[:, None, :]), -8, 7).astype(np.int8)
    low, high = q[:, :half], q[:, half:]
    packed = ((high << 4) | (low & 0xF)).reshape(g * half, n_out).astype(np.int8)
    return packed, scales


def unpack_int4(packed: jnp.ndarray, group_size: int = INT4_GROUP_SIZE) -> jnp.ndarray:
    """packed int8 [in//2, out] -> int8 [in, out] with sign extension
    (inverse of the group-paired packing above)."""
    half = group_size // 2
    n2, out = packed.shape
    g = n2 // half
    p = packed.reshape(g, half, out)
    low = jnp.right_shift(jnp.left_shift(p, 4), 4)  # arithmetic => sign-extend
    high = jnp.right_shift(p, 4)
    return jnp.concatenate([low, high], axis=1).reshape(g * group_size, out)


def dequantize_int4(
    packed: jnp.ndarray, scales: jnp.ndarray, n_in: int, dtype=jnp.bfloat16
) -> jnp.ndarray:
    """-> [n_in, out] (drops any quantization padding rows)."""
    q = unpack_int4(packed).astype(jnp.float32)
    g, out = scales.shape
    group = q.shape[0] // g
    w = q.reshape(g, group, out) * scales[:, None, :].astype(jnp.float32)
    return w.reshape(g * group, out)[:n_in].astype(dtype)
