"""Tensor/expert-parallel sharding on the 8-device virtual CPU mesh:
sharded execution must be numerically identical to single-device execution
(SURVEY.md §7-M5 acceptance: bitwise-equal sampling vs 1-chip)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nanovllm_tpu.config import ActivationType, ModelConfig, NormType, PositionType
from nanovllm_tpu.models import model as M
from nanovllm_tpu.ops import kv_cache as kvc
from nanovllm_tpu.parallel import make_mesh, shard_params, shard_pool

BS = 16


def cfg_moe():
    return ModelConfig(
        vocab_size=211, hidden_size=64, num_layers=2, num_heads=8, num_kv_heads=4,
        intermediate_size=96, max_seq_len=128,
        norm_type=NormType.RMSNORM, position_type=PositionType.ROPE,
        activation=ActivationType.SWIGLU,
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=48,
        dtype="float32",
    )


def _prefill(cfg, params, pool, tokens):
    T = len(tokens)
    nb = 4
    bt = np.arange(nb, dtype=np.int32)
    sm = kvc.make_slot_mapping(bt, 0, T, BS, T, 16 * BS)

    def fn(params, tok, pos, bt, sm, pool):
        return M.prefill_chunk(
            params, cfg, tok, pos, jnp.int32(T), jnp.int32(T), bt, sm, pool, None, None, BS
        )

    return jax.jit(fn)(
        params, jnp.asarray(np.array(tokens, np.int32)), jnp.arange(T, dtype=jnp.int32),
        jnp.asarray(bt), jnp.asarray(sm), pool,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_ep_matches_single_device():
    cfg = cfg_moe()
    params = M.init_params(cfg, seed=3)
    tokens = np.random.default_rng(0).integers(1, cfg.vocab_size, 40).tolist()

    pool1 = kvc.create_kv_pool(cfg.num_layers, 16, BS, cfg.num_kv_heads, cfg.head_dim, dtype=jnp.float32)
    ref_logits, ref_pool, _ = _prefill(cfg, params, pool1, tokens)

    mesh = make_mesh(tp_size=4, dp_size=2)
    with mesh:
        sp = shard_params(params, cfg, mesh)
        pool2 = shard_pool(
            kvc.create_kv_pool(cfg.num_layers, 16, BS, cfg.num_kv_heads, cfg.head_dim, dtype=jnp.float32),
            cfg, mesh,
        )
        tp_logits, tp_pool, _ = _prefill(cfg, sp, pool2, tokens)

    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(tp_pool["k"]), np.asarray(ref_pool["k"]), rtol=1e-5, atol=1e-5
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_contract():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_engine_e2e_tp_matches_single_device():
    """Full LLM engine on a tp=4 mesh produces the same greedy tokens as a
    single-device run (M5 acceptance)."""
    from nanovllm_tpu.config import EngineConfig
    from nanovllm_tpu.engine.llm import LLM
    from nanovllm_tpu.engine.runner import TPUModelRunner
    from nanovllm_tpu.sampling_params import SamplingParams

    cfg = cfg_moe()
    params = M.init_params(cfg, seed=5)
    ecfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=4, max_model_len=128,
        kv_block_size=BS, max_decode_slots=4, min_prefill_bucket=16,
        num_kv_blocks=32, eos_token_id=0, decode_burst=4,
    )
    prompts = [[3, 4, 5, 6, 7], [9, 10, 11]]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    r1 = TPUModelRunner(cfg, ecfg, params=params)
    out1 = LLM(model_config=cfg, engine_config=ecfg, runner=r1).generate(prompts, sp)

    mesh = make_mesh(tp_size=4, dp_size=2)
    with mesh:
        r2 = TPUModelRunner(cfg, ecfg, params=params, mesh=mesh)
        out2 = LLM(model_config=cfg, engine_config=ecfg, runner=r2).generate(prompts, sp)

    for a, b in zip(out1, out2):
        assert a.token_ids == b.token_ids


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_facade_tensor_parallel_size_is_live():
    """LLM(tensor_parallel_size=N) must actually shard (the reference's
    TensorParallelSize was dead — nanovllm/config.go:15; VERDICT r1 weak #2):
    the runner gets a mesh, params get multi-device shardings, and outputs
    match the single-device run."""
    from jax.sharding import PartitionSpec
    from nanovllm_tpu.config import EngineConfig
    from nanovllm_tpu.engine.llm import LLM
    from nanovllm_tpu.sampling_params import SamplingParams

    cfg = cfg_moe()
    params = M.init_params(cfg, seed=7)
    base = dict(
        max_num_batched_tokens=4096, max_num_seqs=4, max_model_len=128,
        kv_block_size=BS, max_decode_slots=4, min_prefill_bucket=16,
        num_kv_blocks=32, eos_token_id=0, decode_burst=2,
    )
    prompts = [[3, 4, 5, 6, 7], [9, 10, 11]]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    llm1 = LLM(model_config=cfg, params=params, engine_config=EngineConfig(**base))
    out1 = llm1.generate(prompts, sp)

    ecfg = EngineConfig(**base, tensor_parallel_size=4, data_parallel_size=2)
    llm2 = LLM(model_config=cfg, params=params, engine_config=ecfg)
    runner = llm2.engine.runner
    assert runner.mesh is not None and runner.mesh.shape == {"data": 2, "model": 4}
    # Q projection is genuinely column-sharded over the model axis.
    qw = runner.params["blocks"][0]["attn"]["q"]["w"]
    assert len(qw.sharding.device_set) == 8
    assert qw.sharding.spec == PartitionSpec(None, "model")
    out2 = llm2.generate(prompts, sp)
    for a, b in zip(out1, out2):
        assert a.token_ids == b.token_ids
