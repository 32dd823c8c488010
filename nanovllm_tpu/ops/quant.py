"""Weight-only quantization: INT8 per-output-channel and INT4 per-group.

New capability relative to the reference (which computes everything in fp32
and has no quantization at all — docs/ARCHITECTURE_GUIDE.md:1599); mandated by
BASELINE.json (ΔPPL ≤0.1 @INT8, ≤0.5 @INT4 vs bf16).

Layout conventions (chosen for the Pallas fused dequant+matmul kernels in
ops/pallas/quant_matmul.py):
  - weights are stored [in_features, out_features] (same as our dense layout);
  - INT8: symmetric, per-output-channel scale [out];
  - INT4: symmetric, per-(group, out) scale [in/group, out], groups of 128
    contiguous rows along the *input* (contraction) dim; two nibbles packed
    per int8 byte with HALVES pairing — byte row r holds W[r] (low nibble)
    and W[in/2 + r] (high nibble), so each nibble plane is a contiguous
    block of weight rows. Nibble encoding is mixed — high nibble two's
    complement, low nibble offset-binary (+8) — so the kernel unpack needs
    only int8 AND + int8->bf16 converts (see quantize_int4 and
    ops/pallas/quant_matmul.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

INT4_GROUP_SIZE = 128


def padded_out_dim(n_out: int) -> int:
    """Column count QuantLinear pads an n_out-wide weight to. Shared with
    the fused-QKV segment-offset math (models/model.py _qkv), which must
    mirror the storage layout exactly."""
    mult = 512 if n_out > 1024 else 128
    return -(-n_out // mult) * mult


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

    layout == "tiled" (int4, single-chip decode): qw is permuted to
    [N_pad/bn0, K_pad//2, bn0] so each kernel grid block is ONE contiguous
    HBM run (the [K/2, N] column-block slices DMA as thousands of bn-byte
    strided runs; measured ~6% faster modeled decode step on v5e, r4).
    Structural transforms (fusion, TP sharding, shard streaming) require
    "kn"; tiling is applied last, by the runner (tile_int4).
    """

    layout = "kn"  # class default: instances unpickled from old caches

    def __init__(self, qw, scale, b, mode: str, n_in: int, n_out: int,
                 layout: str = "kn"):
        self.qw = qw
        self.scale = scale
        self.b = b
        self.mode = mode
        self.n_in = n_in
        self.n_out = n_out
        self.layout = layout

    def tree_flatten(self):
        return (self.qw, self.scale, self.b), (self.mode, self.n_in, self.n_out, self.layout)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qw, scale, b = children
        mode, n_in, n_out = aux[0], aux[1], aux[2]
        layout = aux[3] if len(aux) > 3 else "kn"
        return cls(qw, scale, b, mode, n_in, n_out, layout)

    @classmethod
    def from_dense(cls, w: np.ndarray, b, mode: str) -> "QuantLinear":
        n_in, n_out = w.shape
        # Large contraction dims pad to a coarse multiple so the k-split
        # kernel gets big chunks (18176 would otherwise force 128-row steps);
        # 256 minimum so each packed half is whole 128-row groups.
        kmult = 2048 if n_in > 8192 else 256
        # Output dims pad per padded_out_dim (512 past 1024 cols) so the
        # kernel can tile bn=512: fewer grid steps beat the extra zero
        # columns (they are sliced off the output by n_out).
        w = _pad_to(w, 0, kmult)
        target = padded_out_dim(n_out)
        if w.shape[1] != target:
            w = np.pad(w, [(0, 0), (0, target - w.shape[1])])
        if mode == "int8":
            qw, scale = quantize_int8(w)
        elif mode == "int4":
            qw, scale = quantize_int4(w)
        else:
            raise ValueError(mode)
        return cls(qw, scale, b, mode, n_in, n_out)

    def dequantize(self, dtype=jnp.float32) -> jnp.ndarray:
        qw = self.qw
        if getattr(self, "layout", "kn") == "tiled":
            T, K2, bn0 = qw.shape
            qw = jnp.transpose(qw, (1, 0, 2)).reshape(K2, T * bn0)
        if self.mode == "int8":
            w = dequantize_int8(qw, self.scale, dtype)
        else:
            w = dequantize_int4(qw, self.scale, qw.shape[0] * 2, dtype)
        return w[: self.n_in, : self.n_out]


def tile_quant(p: QuantLinear) -> QuantLinear:
    """[Kq, N] -> [N/bn0, Kq, bn0] tile permutation (contiguous grid-block
    DMAs) for int4 AND int8 (int8 measured 0.752 -> 0.804 of the stream
    floor on the Llama-1B modeled step). Widest 128-multiple tile that
    divides N — fewer, bigger grid steps win at decode (the fixed
    ~0.5us/step bookkeeping is the dominant non-DMA cost); prefill trades
    bm down to fit VMEM (quant_matmul planners). No-op for already-tiled /
    widths with no divisor."""
    if getattr(p, "layout", "kn") != "kn" or p.mode not in ("int4", "int8"):
        return p
    Kq, N = p.qw.shape
    bn0 = next((b for b in (512, 256, 128) if N % b == 0), None)
    if bn0 is None:
        return p
    if isinstance(p.qw, np.ndarray):
        qw3 = np.ascontiguousarray(
            np.asarray(p.qw).reshape(Kq, N // bn0, bn0).transpose(1, 0, 2)
        )
    else:
        qw3 = jnp.transpose(jnp.reshape(p.qw, (Kq, N // bn0, bn0)), (1, 0, 2))
    return QuantLinear(qw3, p.scale, p.b, p.mode, p.n_in, p.n_out, layout="tiled")


# Backwards-compatible alias (r4 int4-only name).
tile_int4 = tile_quant


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
    groups of `group_size` CONTIGUOUS rows along the input (contraction) dim.

    HALVES packing: packed byte row r holds W[r] in the low nibble and
    W[in/2 + r] in the high nibble. Each nibble plane is then a contiguous
    block of weight rows whose matching activation columns are the plain
    halves x[:, :K/2] / x[:, K/2:] — the kernel slices them for free with
    BlockSpec index maps (no gather, no relayout) and runs one depth-128
    dot per scale group (ops/pallas/quant_matmul.py).

    Mixed nibble encoding (Mosaic can't legalize sub-int32 shifts; int8 AND
    + int8->bf16 convert are the cheapest legal unpack):
      high nibble: plain two's complement — (byte & 0xF0) as a SIGNED int8
        equals 16*high, so `(v & -16).astype(bf16) * 0.0625` is exact;
      low nibble: offset-binary (n+8, in [0,15]) — `(v & 0x0F).astype(bf16)
        - 8` is exact (no sign extension needed).
    """
    w = np.asarray(w, dtype=np.float32)
    n_in, n_out = w.shape
    # Both halves must be whole groups: pad to 2*group_size.
    if n_in % (2 * group_size) != 0:
        pad = 2 * group_size - n_in % (2 * group_size)
        w = np.concatenate([w, np.zeros((pad, n_out), np.float32)], axis=0)
        n_in = w.shape[0]
    g = n_in // group_size
    wg = w.reshape(g, group_size, n_out)
    amax = np.max(np.abs(wg), axis=1)  # [g, out]
    scales = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
    # Round scales to bf16-representable values BEFORE quantizing, so a
    # kernel may apply them in bf16 exactly if it chooses — the int grid
    # absorbs the rounding instead of the output.
    import ml_dtypes

    scales = scales.astype(ml_dtypes.bfloat16).astype(np.float32)
    q = np.clip(np.rint(wg / scales[:, None, :]), -8, 7).astype(np.int8).reshape(n_in, n_out)
    low, high = q[: n_in // 2], q[n_in // 2 :]
    packed = ((high << 4) | ((low + 8) & 0xF)).astype(np.int8)
    return packed, scales


def unpack_int4(packed: jnp.ndarray, group_size: int = INT4_GROUP_SIZE) -> jnp.ndarray:
    """packed int8 [in//2, out] -> int8 [in, out] (inverse of the halves
    packing above: low-nibble plane = rows [0, in/2), high = [in/2, in))."""
    low = (jnp.bitwise_and(packed, 0x0F) - 8).astype(jnp.int8)  # offset-binary
    high = jnp.right_shift(packed, 4)           # arithmetic => sign-extend
    return jnp.concatenate([low, high], axis=0)


def dequantize_int4(
    packed: jnp.ndarray, scales: jnp.ndarray, n_in: int, dtype=jnp.bfloat16
) -> jnp.ndarray:
    """-> [n_in, out] (drops any quantization padding rows)."""
    q = unpack_int4(packed).astype(jnp.float32)
    g, out = scales.shape
    group = q.shape[0] // g
    w = q.reshape(g, group, out) * scales[:, None, :].astype(jnp.float32)
    return w.reshape(g * group, out)[:n_in].astype(dtype)
