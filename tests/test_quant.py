"""Quantization round-trip accuracy + quantized linear dispatch (incl. the
Pallas kernels in interpreter mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nanovllm_tpu.ops import quant as Q
from nanovllm_tpu.ops.linear import linear, set_use_pallas


def test_int8_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    qw, scale = Q.quantize_int8(w)
    wd = np.asarray(Q.dequantize_int8(jnp.asarray(qw), jnp.asarray(scale), jnp.float32))
    err = np.abs(wd - w).max()
    assert err <= (np.abs(w).max(axis=0) / 127.0).max() * 0.51 + 1e-6


def test_int4_pack_unpack_exact():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((256, 32)).astype(np.float32)
    packed, scales = Q.quantize_int4(w)
    assert packed.shape == (128, 32)
    assert scales.shape == (2, 32)
    q = np.clip(np.rint(w.reshape(2, 128, 32) / scales[:, None, :]), -8, 7)
    unpacked = np.asarray(Q.unpack_int4(jnp.asarray(packed)))
    np.testing.assert_array_equal(unpacked.reshape(2, 128, 32), q)


def test_int4_roundtrip_error():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((256, 64)).astype(np.float32)
    packed, scales = Q.quantize_int4(w)
    wd = np.asarray(Q.dequantize_int4(jnp.asarray(packed), jnp.asarray(scales), 256, jnp.float32))
    per_group_bound = (np.abs(w.reshape(2, 128, 64)).max(axis=1) / 7.0) * 0.51
    err = np.abs(wd - w).reshape(2, 128, 64).max(axis=1)
    assert (err <= per_group_bound + 1e-6).all()


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quant_linear_close_to_dense(mode):
    rng = np.random.default_rng(3)
    w = (rng.standard_normal((160, 96)) * 0.1).astype(np.float32)
    x = rng.standard_normal((4, 160)).astype(np.float32)
    ql = Q.QuantLinear.from_dense(w, None, mode)
    set_use_pallas(False)
    y = np.asarray(linear(ql, jnp.asarray(x)))
    y_ref = x @ w
    tol = 0.02 if mode == "int8" else 0.2
    assert np.abs(y - y_ref).max() < tol * max(1.0, np.abs(y_ref).max())


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_pallas_kernel_interpret_matches_fallback(mode):
    from nanovllm_tpu.ops.pallas import quant_matmul as pk

    rng = np.random.default_rng(4)
    w = (rng.standard_normal((256, 384)) * 0.1).astype(np.float32)
    x = (rng.standard_normal((24, 256)) * 0.5).astype(np.float32)
    ql = Q.QuantLinear.from_dense(w, None, mode)
    set_use_pallas(False)
    y_ref = np.asarray(linear(ql, jnp.asarray(x)))
    pk.set_interpret(True)
    set_use_pallas(True)
    try:
        y_k = np.asarray(linear(ql, jnp.asarray(x)))
    finally:
        set_use_pallas(None)
        pk.set_interpret(False)
    np.testing.assert_allclose(y_k, y_ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_pallas_ksplit_interpret_matches_fallback(mode, monkeypatch):
    """Force the k-split grid (small K_RESIDENT) — covers the halves-layout
    xh block offset and per-chunk scale slicing."""
    from nanovllm_tpu.ops.pallas import quant_matmul as pk

    monkeypatch.setattr(pk, "K_RESIDENT", 128)
    rng = np.random.default_rng(11)
    # K=4096 so the int4 plan lands on a real bk (2048-multiple, matching
    # the TPU scale-block alignment rule) rather than the fallback.
    w = (rng.standard_normal((4096, 384)) * 0.1).astype(np.float32)
    x = (rng.standard_normal((24, 4096)) * 0.5).astype(np.float32)
    ql = Q.QuantLinear.from_dense(w, None, mode)
    set_use_pallas(False)
    y_ref = np.asarray(linear(ql, jnp.asarray(x)))
    pk.set_interpret(True)
    set_use_pallas(True)
    try:
        y_k = np.asarray(linear(ql, jnp.asarray(x)))
    finally:
        set_use_pallas(None)
        pk.set_interpret(False)
    np.testing.assert_allclose(y_k, y_ref, rtol=2e-2, atol=2e-2)


def test_tiled_layout_dequantize_roundtrip():
    rng = np.random.default_rng(13)
    w = (rng.standard_normal((512, 768)) * 0.1).astype(np.float32)
    ql = Q.QuantLinear.from_dense(w, None, "int4")
    qt = Q.tile_int4(ql)
    assert qt.layout == "tiled" and qt.qw.ndim == 3
    np.testing.assert_array_equal(
        np.asarray(qt.dequantize()), np.asarray(ql.dequantize())
    )
    # int8 tiles too (r4); double-tiling is a no-op.
    q8 = Q.QuantLinear.from_dense(w, None, "int8")
    q8t = Q.tile_quant(q8)
    assert q8t.layout == "tiled" and q8t.qw.ndim == 3
    np.testing.assert_array_equal(
        np.asarray(q8t.dequantize()), np.asarray(q8.dequantize())
    )
    assert Q.tile_quant(qt) is qt


@pytest.mark.parametrize("mode", ["int4", "int8"])
@pytest.mark.parametrize("K", [256, 4096])
def test_pallas_tiled_kernel_interpret_matches_kn(K, mode, monkeypatch):
    """The tiled-layout kernels (resident K=256 and k-split K=4096) must be
    bit-identical to the kn kernels — same dots, same scale application,
    only the HBM block layout differs."""
    from nanovllm_tpu.ops.pallas import quant_matmul as pk

    if K > 256:
        monkeypatch.setattr(pk, "K_RESIDENT", 128)
    rng = np.random.default_rng(17)
    w = (rng.standard_normal((K, 768)) * 0.1).astype(np.float32)
    x = jnp.asarray((rng.standard_normal((24, K)) * 0.5).astype(np.float32))
    ql = Q.QuantLinear.from_dense(w, None, mode)
    qt = Q.tile_quant(ql)
    pk.set_interpret(True)
    try:
        y_kn = np.asarray(pk.quant_matmul(x, ql))
        y_t = np.asarray(pk.quant_matmul(x, qt))
    finally:
        pk.set_interpret(False)
    np.testing.assert_array_equal(y_t, y_kn)
