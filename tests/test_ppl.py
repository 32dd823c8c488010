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


def test_strided_ppl_matches_plain_when_window_covers():
    from nanovllm_tpu.eval.ppl import strided_perplexity

    cfg = cfg_of()
    params = M.init_params(cfg, seed=0)
    toks = np.random.default_rng(2).integers(1, cfg.vocab_size, 40).tolist()
    plain = perplexity(cfg, params, [toks])
    strided = strided_perplexity(cfg, params, toks, window=64, stride=32)
    assert abs(math.log(strided) - math.log(plain)) < 1e-4


def test_strided_ppl_long_corpus():
    """Corpus longer than the window: every token scored exactly once, with
    >= window - stride context past the first window."""
    from nanovllm_tpu.eval.ppl import strided_perplexity

    cfg = cfg_of()
    params = M.init_params(cfg, seed=0)
    toks = np.random.default_rng(3).integers(1, cfg.vocab_size, 150).tolist()
    p = strided_perplexity(cfg, params, toks, window=64, stride=32)
    assert math.isfinite(p) and p > 1
    # More context can only help (or be neutral) on average vs tiny stride
    # evaluation of the same model; sanity: both within a sane band.
    p2 = strided_perplexity(cfg, params, toks, window=64, stride=64)
    assert math.isfinite(p2) and p2 > 1
