"""fuse_qkv_params must be numerics-identical to separate q/k/v projections,
both dense and quantized (pre- OR post-quantization fusion)."""

import copy

import numpy as np
import jax.numpy as jnp

from nanovllm_tpu.config import ActivationType, ModelConfig, NormType, PositionType
from nanovllm_tpu.models import model as M
from nanovllm_tpu.ops import kv_cache as kvc

BS = 16


def cfg_of(**kw):
    base = dict(
        vocab_size=97, hidden_size=48, num_layers=2, num_heads=4, num_kv_heads=2,
        intermediate_size=64, max_seq_len=128, norm_type=NormType.RMSNORM,
        position_type=PositionType.ROPE, activation=ActivationType.SWIGLU,
        dtype="float32", eos_token_id=0, attn_bias=True,
    )
    base.update(kw)
    return ModelConfig(**base)


def run_prefill(cfg, params, toks, NB=8, nb=4):
    pool = kvc.create_kv_pool(cfg.num_layers, NB, BS, cfg.num_kv_heads, cfg.head_dim, dtype=jnp.float32)
    bt = np.arange(nb, dtype=np.int32)
    T = len(toks)
    sm = kvc.make_slot_mapping(bt, 0, T, BS, T, NB * BS)
    logits, pool, _ = M.prefill_chunk(
        params, cfg, jnp.asarray(toks), jnp.arange(T, dtype=jnp.int32),
        jnp.int32(T), jnp.int32(T), jnp.asarray(bt), jnp.asarray(sm),
        pool, None, None, BS,
    )
    return np.asarray(logits), pool


def test_dense_fusion_exact():
    cfg = cfg_of()
    params_np = M.init_params(cfg, seed=0, numpy=True)
    toks = np.random.default_rng(0).integers(1, 97, 24).astype(np.int32)

    ref, pool_ref = run_prefill(cfg, M.to_device_params(copy.deepcopy(params_np), cfg), toks)
    fused_np = M.fuse_qkv_params(copy.deepcopy(params_np))
    assert "qkv" in fused_np["blocks"][0]["attn"]
    out, pool_f = run_prefill(cfg, M.to_device_params(fused_np, cfg), toks)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pool_f["k"]), np.asarray(pool_ref["k"]), rtol=1e-5, atol=1e-5)


def test_quantized_fusion_pre_equals_post():
    """fuse-then-quantize == quantize-then-fuse == unfused (within int8
    rounding of identical values: exactly equal, since per-column scales)."""
    from nanovllm_tpu.io.loader import quantize_params

    # 128-multiple head widths so the quantized path exercises real shapes;
    # every projection above _QUANT_MIN_SIZE (256*256) so all variants
    # quantize the same set (a fused block quantizes as one matrix, so tiny
    # k/v that the size gate would leave dense get quantized when fused —
    # fine at real shapes where everything clears the gate).
    cfg = cfg_of(hidden_size=256, num_heads=4, num_kv_heads=4, head_dim=64,
                 intermediate_size=256, attn_bias=False)
    params_np = M.init_params(cfg, seed=1, numpy=True)
    toks = np.random.default_rng(1).integers(1, 97, 16).astype(np.int32)

    q_unfused = quantize_params(copy.deepcopy(params_np), "int8")
    pre = quantize_params(M.fuse_qkv_params(copy.deepcopy(params_np)), "int8")
    post = M.fuse_qkv_params(copy.deepcopy(q_unfused))

    ref, _ = run_prefill(cfg, M.to_device_params(copy.deepcopy(q_unfused), cfg), toks)
    out_pre, _ = run_prefill(cfg, M.to_device_params(pre, cfg), toks)
    out_post, _ = run_prefill(cfg, M.to_device_params(post, cfg), toks)
    np.testing.assert_allclose(out_pre, ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out_post, ref, rtol=1e-5, atol=1e-5)


def test_non_multiple_of_128_widths():
    """Falcon-like: Hq*D not a 128-multiple — dense fusion zero-pads segments
    to the quantized layout's offsets."""
    cfg = cfg_of(num_heads=3, num_kv_heads=1, head_dim=16, hidden_size=48)
    params_np = M.init_params(cfg, seed=2, numpy=True)
    toks = np.random.default_rng(2).integers(1, 97, 8).astype(np.int32)
    ref, _ = run_prefill(cfg, M.to_device_params(copy.deepcopy(params_np), cfg), toks)
    fused = M.fuse_qkv_params(copy.deepcopy(params_np))
    out, _ = run_prefill(cfg, M.to_device_params(fused, cfg), toks)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
