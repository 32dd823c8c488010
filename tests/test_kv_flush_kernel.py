"""Pallas window-merge flush kernel (interpret mode) vs the XLA scatter
flush: identical pool contents for every (J, block_size, crossing, masking,
inactive-lane) combination."""

import numpy as np
import jax.numpy as jnp
import pytest

from nanovllm_tpu.config import ActivationType, ModelConfig, NormType, PositionType
from nanovllm_tpu.models import model as M
from nanovllm_tpu.ops.pallas import kv_flush


def tiny_cfg():
    return ModelConfig(
        vocab_size=97, hidden_size=48, num_layers=2, num_heads=4, num_kv_heads=2,
        intermediate_size=64, max_seq_len=256, norm_type=NormType.RMSNORM,
        position_type=PositionType.ROPE, activation=ActivationType.SWIGLU,
        dtype="float32", eos_token_id=0,
    )


@pytest.mark.parametrize("J,bs,max_positions", [
    (8, 16, 10_000),   # windows cross pages and alignment boundaries
    (8, 32, 10_000),   # windows cross alignment but not page boundaries
    (16, 16, 10_000),  # J == block_size
    (8, 16, 60),       # max_model_len clamp drops tail rows
])
def test_flush_kernel_matches_xla(J, bs, max_positions):
    cfg = tiny_cfg()
    L, B, nb = cfg.num_layers, 4, 4
    HD = cfg.num_kv_heads * cfg.head_dim
    num_blocks = 17
    nslots = num_blocks * bs
    rng = np.random.default_rng(J * 1000 + bs)

    pool0 = {
        "k": jnp.asarray(rng.standard_normal((L * nslots, HD)), jnp.float32),
        "v": jnp.asarray(rng.standard_normal((L * nslots, HD)), jnp.float32),
    }
    stash = {
        "k": jnp.asarray(rng.standard_normal((L, J, B, HD)), jnp.float32),
        "v": jnp.asarray(rng.standard_normal((L, J, B, HD)), jnp.float32),
    }
    # Disjoint per-lane block tables; block 0 reserved (BlockManager invariant).
    perm = 1 + rng.permutation(num_blocks - 1)
    block_tables = perm[: B * nb].reshape(B, nb).astype(np.int32)
    # Lane 0: aligned start; lane 1: crosses a window boundary; lane 2:
    # crosses a PAGE boundary; lane 3: inactive (garbage positions).
    positions0 = np.array([0, J + max(1, J // 2), bs - max(1, J // 2), 7], np.int32)
    if max_positions < 10_000:
        positions0[1] = max_positions - max(1, J // 2)  # tail rows clamped
    active = np.array([True, True, True, False])

    assert kv_flush.flush_supported(J, bs, pool0)
    # Sub-sublane bursts fall back to the XLA scatter (TPU tiling rule).
    assert not kv_flush.flush_supported(4, bs, pool0)
    ref = M.flush_burst_stash(
        dict(pool0), cfg, stash, jnp.asarray(block_tables),
        jnp.asarray(positions0), jnp.asarray(active), bs,
        max_positions=max_positions,
    )
    kv_flush.set_interpret(True)
    try:
        out = kv_flush.flush_burst_stash_pallas(
            dict(pool0), stash, jnp.asarray(block_tables),
            jnp.asarray(positions0), jnp.asarray(active), bs,
            max_positions=max_positions,
        )
        # Pre-transposed lane-major stash (the bhjd carry path) must write
        # identical bytes.
        out_lm = kv_flush.flush_burst_stash_pallas(
            dict(pool0),
            {n: jnp.swapaxes(s, 1, 2) for n, s in stash.items()},
            jnp.asarray(block_tables), jnp.asarray(positions0),
            jnp.asarray(active), bs, max_positions=max_positions,
            lane_major=True,
        )
    finally:
        kv_flush.set_interpret(False)
    for key in ("k", "v"):
        np.testing.assert_array_equal(
            np.asarray(out[key]), np.asarray(out_lm[key]), err_msg=key
        )

    # Rows of reserved block 0 are the kernel's dustbin: it may rewrite them
    # (with their own old contents) — exclude from the comparison the same
    # way real reads exclude them (block 0 is never allocated).
    live = np.ones(L * nslots, bool)
    for layer in range(L):
        live[layer * nslots : layer * nslots + bs] = False
    for key in ("k", "v"):
        np.testing.assert_array_equal(
            np.asarray(ref[key])[live], np.asarray(out[key])[live], err_msg=key
        )
        # And block 0's contents must still be exactly its old contents
        # (the dustbin write is old-content-only, value-preserving).
        np.testing.assert_array_equal(
            np.asarray(out[key])[~live], np.asarray(pool0[key])[~live]
        )


def test_engine_decode_with_kernel_flush_matches(monkeypatch):
    """Full engine generation with the Pallas flush (interpret) must be
    bit-identical to the XLA scatter flush."""
    from nanovllm_tpu.config import EngineConfig
    from nanovllm_tpu.engine.llm import LLM
    from nanovllm_tpu.sampling_params import SamplingParams

    cfg = tiny_cfg()
    params = M.init_params(cfg, seed=7)
    prompts = [list(range(1, 40)), list(range(2, 20)), [5, 6]]
    sp = SamplingParams(temperature=0.0, max_tokens=20, ignore_eos=True)

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
    ref = run()
    monkeypatch.setenv("NANOVLLM_FLUSH_KERNEL", "1")
    kv_flush.set_interpret(True)
    try:
        out = run()
    finally:
        kv_flush.set_interpret(False)
    for a, b in zip(ref, out):
        assert a.token_ids == b.token_ids
