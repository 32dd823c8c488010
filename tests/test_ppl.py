"""Perplexity harness + quantization-quality smoke (the dPPL acceptance
methodology from BASELINE.json at tiny scale)."""

import math

import numpy as np

from nanovllm_tpu.config import ActivationType, ModelConfig, NormType, PositionType
from nanovllm_tpu.eval.ppl import perplexity
from nanovllm_tpu.io.loader import quantize_params
from nanovllm_tpu.models import model as M


def cfg_of(dtype="float32"):
    return ModelConfig(
        vocab_size=211, hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
        intermediate_size=96, max_seq_len=128, norm_type=NormType.RMSNORM,
        position_type=PositionType.ROPE, activation=ActivationType.SWIGLU,
        dtype=dtype, eos_token_id=0,
    )


def test_ppl_uniform_sanity():
    """Random-weight model ~= uniform predictor: PPL near vocab size scale,
    and strictly positive/finite."""
    cfg = cfg_of()
    params = M.init_params(cfg, seed=0)
    toks = np.random.default_rng(0).integers(1, cfg.vocab_size, 48).tolist()
    ppl = perplexity(cfg, params, [toks])
    assert math.isfinite(ppl) and 10 < ppl < 5000


def test_quantization_dppl_small():
    cfg = cfg_of()
    params_np = M.init_params(cfg, seed=0, numpy=True)
    toks = np.random.default_rng(1).integers(1, cfg.vocab_size, 48).tolist()
    base = perplexity(cfg, M.to_device_params(params_np, cfg), [toks])
    for mode, budget in (("int8", 0.1), ("int4", 0.5)):
        q = perplexity(cfg, M.to_device_params(quantize_params(dict(params_np), mode), cfg), [toks])
        # Tiny models + per-group scales: quantization must not blow up PPL.
        assert abs(q - base) < budget * 10, f"{mode}: {q} vs {base}"
