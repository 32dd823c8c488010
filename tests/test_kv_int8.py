"""INT8 paged KV cache: quantize-on-append + dequant-on-gather must stay
close to the fp32 pipeline (new capability; BASELINE.json north star)."""

import numpy as np
import jax.numpy as jnp

from nanovllm_tpu.config import EngineConfig, ModelConfig, NormType, PositionType, ActivationType
from nanovllm_tpu.engine.llm import LLM
from nanovllm_tpu.ops import kv_cache as kvc
from nanovllm_tpu.sampling_params import SamplingParams

BS = 16


def test_kv_int8_roundtrip():
    pool = kvc.create_kv_pool(1, 4, BS, 2, 8, quantized=True)
    rng = np.random.default_rng(0)
    k = rng.standard_normal((10, 2, 8)).astype(np.float32)
    v = rng.standard_normal((10, 2, 8)).astype(np.float32)
    sm = jnp.asarray(np.arange(10, dtype=np.int32) + 16)  # block 1
    pool = kvc.kv_write(pool, 0, 4 * BS, jnp.asarray(k), jnp.asarray(v), sm)
    bt = jnp.asarray(np.array([[1, 0]], np.int32))
    kg, vg = kvc.kv_gather(pool, 0, 4 * BS, bt, BS, 2, dtype=jnp.float32)
    # first 10 slots of block 1 hold our values
    np.testing.assert_allclose(np.asarray(kg)[0, :10], k, atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(vg)[0, :10], v, atol=2e-2, rtol=2e-2)
    # padding slots remain zero
    assert np.abs(np.asarray(kg)[0, 10:]).max() == 0


def test_engine_int8_kv_close_to_fp32():
    cfg = ModelConfig(
        vocab_size=97, hidden_size=48, num_layers=2, num_heads=4, num_kv_heads=2,
        intermediate_size=64, max_seq_len=128, norm_type=NormType.RMSNORM,
        position_type=PositionType.ROPE, activation=ActivationType.SWIGLU,
        dtype="float32", eos_token_id=0,
    )
    base = dict(
        max_num_batched_tokens=4096, max_num_seqs=4, max_model_len=128,
        kv_block_size=BS, max_decode_slots=4, min_prefill_bucket=16,
        num_kv_blocks=32, eos_token_id=0,
    )
    prompts = [[5, 6, 7, 8, 9, 10], [11, 12, 13]]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    llm_fp = LLM(model_config=cfg, engine_config=EngineConfig(**base))
    out_fp = llm_fp.generate(prompts, sp)
    llm_q = LLM(model_config=cfg, engine_config=EngineConfig(**base, kv_cache_dtype="int8"))
    out_q = llm_q.generate(prompts, sp)

    # INT8 KV perturbs logits slightly; greedy argmax should mostly agree on
    # a random tiny model — require the first few tokens to match.
    for a, b in zip(out_fp, out_q):
        assert a.token_ids[:3] == b.token_ids[:3]
