"""Pallas page-copy pregather kernel (interpret mode) vs the XLA row gather:
identical context tensors (modulo the deliberate S-minor transpose), and
identical engine generations when wired into the burst decode path."""

import numpy as np
import jax.numpy as jnp

from nanovllm_tpu.config import ActivationType, EngineConfig, ModelConfig, NormType, PositionType
from nanovllm_tpu.models import model as M
from nanovllm_tpu.ops.pallas import kv_flush, kv_pregather


def tiny_cfg():
    return ModelConfig(
        vocab_size=97, hidden_size=48, num_layers=2, num_heads=4, num_kv_heads=2,
        intermediate_size=64, max_seq_len=256, norm_type=NormType.RMSNORM,
        position_type=PositionType.ROPE, activation=ActivationType.SWIGLU,
        dtype="float32", eos_token_id=0,
    )


def test_pregather_kernel_matches_xla_gather():
    cfg = tiny_cfg()
    L, B, nb, bs = cfg.num_layers, 3, 4, 16
    HD = cfg.num_kv_heads * cfg.head_dim
    num_blocks = 14
    nslots = num_blocks * bs
    rng = np.random.default_rng(3)
    pool = {
        "k": jnp.asarray(rng.standard_normal((L * nslots, HD)), jnp.float32),
        "v": jnp.asarray(rng.standard_normal((L * nslots, HD)), jnp.float32),
    }
    perm = 1 + rng.permutation(num_blocks - 1)
    bt = jnp.asarray(perm[: B * nb].reshape(B, nb).astype(np.int32))

    k_ref, v_ref = M.pregather_context(cfg, pool, bt, bs)  # [L,B,S,Hkv,D]
    kv_pregather.set_interpret(True)
    try:
        k_t, v_t = kv_pregather.pregather_context_pallas(
            pool, bt, bs, L, num_kv_heads=cfg.num_kv_heads, transpose=True
        )  # [L, B, Hkv, D, S]
        k_nt, v_nt = kv_pregather.pregather_context_pallas(
            pool, bt, bs, L, transpose=False
        )  # [L, B, S, HD]
    finally:
        kv_pregather.set_interpret(False)

    S = nb * bs
    Hkv, D = cfg.num_kv_heads, cfg.head_dim
    for ref, t, nt in ((k_ref, k_t, k_nt), (v_ref, v_t, v_nt)):
        ref_flat = np.asarray(ref).reshape(L, B, S, HD)
        np.testing.assert_array_equal(np.asarray(nt), ref_flat)
        # transposed: [L, B, S, Hkv, D] -> [L, B, Hkv, D, S]
        ref5 = np.asarray(ref).transpose(0, 1, 3, 4, 2)
        np.testing.assert_array_equal(np.asarray(t), ref5)


def test_engine_decode_with_both_kernels_matches(monkeypatch):
    """Kernel pregather (transposed ctx) + kernel flush vs the XLA paths:
    identical greedy generations."""
    from nanovllm_tpu.engine.llm import LLM
    from nanovllm_tpu.sampling_params import SamplingParams

    cfg = tiny_cfg()
    params = M.init_params(cfg, seed=9)
    prompts = [list(range(1, 40)), list(range(2, 25)), [3, 4, 5]]
    sp = SamplingParams(temperature=0.0, max_tokens=18, ignore_eos=True)

    def run():
        ecfg = EngineConfig(
            max_num_batched_tokens=4096, max_num_seqs=4, max_model_len=128,
            kv_block_size=16, max_decode_slots=4, min_prefill_bucket=16,
            num_kv_blocks=64, eos_token_id=0, decode_burst=8,
            deferred_kv_writes=True,
        )
        llm = LLM(model_config=cfg, engine_config=ecfg, params=params)
        return llm.generate(prompts, sp)

    monkeypatch.setenv("NANOVLLM_FLUSH_KERNEL", "0")
    monkeypatch.setenv("NANOVLLM_PREGATHER_KERNEL", "0")
    ref = run()
    monkeypatch.setenv("NANOVLLM_FLUSH_KERNEL", "1")
    monkeypatch.setenv("NANOVLLM_PREGATHER_KERNEL", "1")
    kv_flush.set_interpret(True)
    kv_pregather.set_interpret(True)
    try:
        out = run()
    finally:
        kv_flush.set_interpret(False)
        kv_pregather.set_interpret(False)
    for a, b in zip(ref, out):
        assert a.token_ids == b.token_ids
