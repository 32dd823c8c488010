"""Linear layers over dense or quantized weights.

The single entry point `linear(p, x)` dispatches on the param container:
  dict {'w': [in,out], 'b': [out]?}   dense (bf16/fp32), plain MXU dot
  ops.quant.QuantLinear               INT8 (per-channel) / INT4 (per-group)

Replaces the reference's cache-aware fp32 MatMul loop
(/root/reference/purego/tensor/tensor.go:62-88). Quantized paths use the
fused Pallas dequant+matmul kernels (ops/pallas/quant_matmul.py) on TPU, with
an XLA dequantize-then-matmul fallback usable on any backend (CPU tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nanovllm_tpu.ops.quant import QuantLinear

# Tri-state: None = auto (TPU only), True/False = forced.
_USE_PALLAS: bool | None = None


def set_use_pallas(flag: bool | None) -> None:
    global _USE_PALLAS
    _USE_PALLAS = flag


def _pallas_ok() -> bool:
    if _USE_PALLAS is not None:
        return _USE_PALLAS
    return jax.default_backend() == "tpu"


def linear(p, x: jnp.ndarray) -> jnp.ndarray:
    """x [..., in] -> [..., out]."""
    if isinstance(p, QuantLinear):
        y = _quant_matmul(p, x)
        b = p.b
    else:
        y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32)
        b = p.get("b")
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _quant_matmul(p: QuantLinear, x: jnp.ndarray) -> jnp.ndarray:
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if _pallas_ok():
        from nanovllm_tpu.ops.pallas.quant_matmul import quant_matmul

        y = quant_matmul(x2, p)
    else:
        w = p.dequantize(dtype=x.dtype)
        y = jnp.dot(x2, w, preferred_element_type=jnp.float32)
    return y.reshape(*lead, p.n_out)
