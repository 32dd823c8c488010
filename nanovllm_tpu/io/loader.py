"""Safetensors checkpoint loading + per-architecture weight mapping.

Capability parity with /root/reference/purego/tensor/generic_loader.go (the
reference's largest component): single-file and sharded-index safetensors
(:184, :1042), per-arch key schemas (:60-181), fused-QKV splits (GPT-2 column
split :674-702; Falcon de-interleave :705-748), PyTorch [out,in]→[in,out]
transposes, F32/F16/BF16 ingestion (:769-805). Re-designed as per-arch
converter functions over a flat numpy state dict instead of declarative
tables, with weight-only INT8/INT4 quantization applied at load time (new
capability, BASELINE.json).

Falcon QKV note: for `multi_query` checkpoints (Falcon-7B) the fused rows are
[Q_head0..Q_head{H-1}, K, V] — a plain split; for `new_decoder_architecture`
(Falcon-40B) rows interleave per KV-group [q*group, k, v] and are
de-interleaved here (the reference's historical garbage-output bug site,
docs/changes/FALCON_SUCCESS.md:28-31).
"""

from __future__ import annotations

import json
import os
from typing import Callable

import numpy as np

from nanovllm_tpu.config import ActivationType, LayerKind, ModelConfig, PositionType
from nanovllm_tpu.io.hf_config import load_hf_config, model_config_from_hf
from nanovllm_tpu.ops import quant as quant_ops
from nanovllm_tpu.ops.rope import compute_inv_freq


# ---------------------------------------------------------------------------
# Safetensors reading
# ---------------------------------------------------------------------------


def read_safetensors_dir(model_dir: str) -> dict[str, np.ndarray]:
    """Load all tensors from model.safetensors or a sharded
    model.safetensors.index.json (reference generic_loader.go:1030-1034)."""
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    files: list[str]
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
    else:
        single = os.path.join(model_dir, "model.safetensors")
        if not os.path.exists(single):
            cands = [f for f in os.listdir(model_dir) if f.endswith(".safetensors")]
            if not cands:
                raise FileNotFoundError(f"no safetensors files in {model_dir}")
            files = sorted(cands)
        else:
            files = ["model.safetensors"]
    out: dict[str, np.ndarray] = {}
    for fname in files:
        path = os.path.join(model_dir, fname)
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                t = f.get_tensor(k)
                if t.dtype == np.float16 or str(t.dtype) == "bfloat16":
                    t = t.astype(np.float32)
                out[k] = t
    return out


# ---------------------------------------------------------------------------
# Converters: HF state dict -> nanovllm_tpu params pytree (numpy)
# ---------------------------------------------------------------------------


def _lin_t(sd: dict, key: str, bias_key: str | None = None) -> dict:
    """HF nn.Linear stores [out, in] -> ours [in, out]."""
    p = {"w": np.ascontiguousarray(sd[key].T)}
    if bias_key and bias_key in sd:
        p["b"] = sd[bias_key]
    return p


def _lin(sd: dict, key: str, bias_key: str | None = None) -> dict:
    """GPT-2 Conv1D already stores [in, out]."""
    p = {"w": sd[key]}
    if bias_key and bias_key in sd:
        p["b"] = sd[bias_key]
    return p


def _norm(sd: dict, key: str) -> dict:
    p = {"scale": sd[key + ".weight"]}
    if key + ".bias" in sd:
        p["bias"] = sd[key + ".bias"]
    return p


def _gpt2_prelude(sd: dict, cfg: ModelConfig) -> dict:
    return {
        "embed": sd["transformer.wte.weight"],
        "pos_embed": sd["transformer.wpe.weight"],
        "final_norm": _norm(sd, "transformer.ln_f"),
        "blocks": [],
    }


def _gpt2_block(sd: dict, cfg: ModelConfig, i: int) -> dict:
    p = f"transformer.h.{i}"
    w = sd[f"{p}.attn.c_attn.weight"]  # [E, 3E] fused (Conv1D layout)
    b = sd.get(f"{p}.attn.c_attn.bias")
    q_w, k_w, v_w = np.split(w, 3, axis=1)  # column split (ref :674-702)
    blk = {
        "ln1": _norm(sd, f"{p}.ln_1"),
        "attn": {
            "q": {"w": q_w},
            "k": {"w": k_w},
            "v": {"w": v_w},
            "o": _lin(sd, f"{p}.attn.c_proj.weight", f"{p}.attn.c_proj.bias"),
        },
        "ln2": _norm(sd, f"{p}.ln_2"),
        "mlp": {
            "up": _lin(sd, f"{p}.mlp.c_fc.weight", f"{p}.mlp.c_fc.bias"),
            "down": _lin(sd, f"{p}.mlp.c_proj.weight", f"{p}.mlp.c_proj.bias"),
        },
    }
    if b is not None:
        qb, kb, vb = np.split(b, 3)
        blk["attn"]["q"]["b"] = qb
        blk["attn"]["k"]["b"] = kb
        blk["attn"]["v"]["b"] = vb
    return blk


def _llama_prelude(sd: dict, cfg: ModelConfig) -> dict:
    """Llama 3.x / Mistral (same key schema; reference :99-117)."""
    params = {
        "embed": sd["model.embed_tokens.weight"],
        "final_norm": _norm(sd, "model.norm"),
        "blocks": [],
    }
    if "lm_head.weight" in sd and not cfg.tie_word_embeddings:
        params["lm_head"] = _lin_t(sd, "lm_head.weight")
    return params


def _llama_block(sd: dict, cfg: ModelConfig, i: int) -> dict:
    p = f"model.layers.{i}"
    gate = sd[f"{p}.mlp.gate_proj.weight"].T  # [E, I]
    up = sd[f"{p}.mlp.up_proj.weight"].T
    blk = {
        "ln1": _norm(sd, f"{p}.input_layernorm"),
        "attn": {
            "q": _lin_t(sd, f"{p}.self_attn.q_proj.weight", f"{p}.self_attn.q_proj.bias"),
            "k": _lin_t(sd, f"{p}.self_attn.k_proj.weight", f"{p}.self_attn.k_proj.bias"),
            "v": _lin_t(sd, f"{p}.self_attn.v_proj.weight", f"{p}.self_attn.v_proj.bias"),
            "o": _lin_t(sd, f"{p}.self_attn.o_proj.weight"),
        },
        "ln2": _norm(sd, f"{p}.post_attention_layernorm"),
        "mlp": {
            # gate-first concat (SwiGLU ordering bug site, BUGFIX_SWIGLU.md)
            "up": {"w": np.concatenate([gate, up], axis=1)},
            "down": _lin_t(sd, f"{p}.mlp.down_proj.weight"),
        },
    }
    return blk


def split_falcon_qkv(
    w: np.ndarray, num_heads: int, num_kv_heads: int, head_dim: int, new_decoder_arch: bool
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """w is HF fused [ (H + 2*Hkv) * D, E ] (row-major out-dim). Returns
    (q [H*D, E], k [Hkv*D, E], v [Hkv*D, E])."""
    E = w.shape[1]
    D = head_dim
    if not new_decoder_arch:
        # multi_query (Falcon-7B): rows are [Q0..Q{H-1}, K, V].
        q = w[: num_heads * D]
        k = w[num_heads * D : (num_heads + num_kv_heads) * D]
        v = w[(num_heads + num_kv_heads) * D :]
        return q, k, v
    # new_decoder_architecture (Falcon-40B): per KV-group interleave
    # [q*group, k, v] repeated num_kv_heads times.
    group = num_heads // num_kv_heads
    w4 = w.reshape(num_kv_heads, group + 2, D, E)
    q = w4[:, :group].reshape(num_heads * D, E)
    k = w4[:, group].reshape(num_kv_heads * D, E)
    v = w4[:, group + 1].reshape(num_kv_heads * D, E)
    return q, k, v


def _falcon_prelude(sd: dict, cfg: ModelConfig) -> dict:
    params = {
        "embed": sd["transformer.word_embeddings.weight"],
        "final_norm": _norm(sd, "transformer.ln_f"),
        "blocks": [],
    }
    if "lm_head.weight" in sd and not cfg.tie_word_embeddings:
        params["lm_head"] = _lin_t(sd, "lm_head.weight")
    return params


def _falcon_block(sd: dict, cfg: ModelConfig, i: int) -> dict:
    # Falcon-40B ("new decoder architecture") has separate ln_attn/ln_mlp and
    # a per-KV-group interleaved fused QKV; Falcon-7B has a single
    # input_layernorm and a plain [Q..., K, V] split.
    new_arch = "transformer.h.0.ln_attn.weight" in sd
    p = f"transformer.h.{i}"
    qkv = sd[f"{p}.self_attention.query_key_value.weight"]
    q, k, v = split_falcon_qkv(
        qkv, cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, new_decoder_arch=new_arch
    )
    blk = {
        "ln1": _norm(sd, f"{p}.ln_attn" if new_arch else f"{p}.input_layernorm"),
        "attn": {
            "q": {"w": np.ascontiguousarray(q.T)},
            "k": {"w": np.ascontiguousarray(k.T)},
            "v": {"w": np.ascontiguousarray(v.T)},
            "o": _lin_t(sd, f"{p}.self_attention.dense.weight"),
        },
        "mlp": {
            "up": _lin_t(sd, f"{p}.mlp.dense_h_to_4h.weight", f"{p}.mlp.dense_h_to_4h.bias"),
            "down": _lin_t(sd, f"{p}.mlp.dense_4h_to_h.weight", f"{p}.mlp.dense_4h_to_h.bias"),
        },
    }
    if new_arch:
        blk["ln2"] = _norm(sd, f"{p}.ln_mlp")
    return blk


def _granite_moe_prelude(sd: dict, cfg: ModelConfig) -> dict:
    """Granite 3.0 MoE (reference :119-143). Expert weights are stored
    expert-major [X, out, in] — transposed here to [X, in, out]."""
    params = {
        "embed": sd["model.embed_tokens.weight"],
        "final_norm": _norm(sd, "model.norm"),
        "blocks": [],
    }
    if "lm_head.weight" in sd and not cfg.tie_word_embeddings:
        params["lm_head"] = _lin_t(sd, "lm_head.weight")
    return params


def _granite_moe_block(sd: dict, cfg: ModelConfig, i: int) -> dict:
    p = f"model.layers.{i}"
    blk = {
        "ln1": _norm(sd, f"{p}.input_layernorm"),
        "attn": {
            "q": _lin_t(sd, f"{p}.self_attn.q_proj.weight"),
            "k": _lin_t(sd, f"{p}.self_attn.k_proj.weight"),
            "v": _lin_t(sd, f"{p}.self_attn.v_proj.weight"),
            "o": _lin_t(sd, f"{p}.self_attn.o_proj.weight"),
        },
        "ln2": _norm(sd, f"{p}.post_attention_layernorm"),
        "moe": {
            "router": _lin_t(sd, f"{p}.block_sparse_moe.router.layer.weight"),
            "gate_up": np.ascontiguousarray(
                sd[f"{p}.block_sparse_moe.input_linear.weight"].transpose(0, 2, 1)
            ),
            "down": np.ascontiguousarray(
                sd[f"{p}.block_sparse_moe.output_linear.weight"].transpose(0, 2, 1)
            ),
        },
    }
    return blk


def _granite_hybrid_prelude(sd: dict, cfg: ModelConfig) -> dict:
    """Granite 4.0 hybrid: Mamba2 mixer layers + (rope-less) attention layers,
    shared SwiGLU MLP on every layer (reference mamba2 keys :49-56,146-181)."""
    params = {
        "embed": sd["model.embed_tokens.weight"],
        "final_norm": _norm(sd, "model.norm"),
        "blocks": [],
    }
    if "lm_head.weight" in sd and not cfg.tie_word_embeddings:
        params["lm_head"] = _lin_t(sd, "lm_head.weight")
    return params


def _granite_hybrid_block(sd: dict, cfg: ModelConfig, i: int) -> dict:
    p = f"model.layers.{i}"
    blk: dict = {
        "ln1": _norm(sd, f"{p}.input_layernorm"),
        "ln2": _norm(sd, f"{p}.post_attention_layernorm"),
    }
    if cfg.layer_kind(i) == LayerKind.MAMBA2:
        conv_w = sd[f"{p}.mamba.conv1d.weight"]  # [conv_dim, 1, K]
        blk["mamba"] = {
            "in_proj": _lin_t(sd, f"{p}.mamba.in_proj.weight"),
            "conv_w": np.ascontiguousarray(conv_w[:, 0, :].T),  # [K, conv_dim]
            "conv_b": sd.get(
                f"{p}.mamba.conv1d.bias",
                np.zeros((conv_w.shape[0],), np.float32),
            ),
            "A_log": sd[f"{p}.mamba.A_log"],
            "D": sd[f"{p}.mamba.D"],
            "dt_bias": sd[f"{p}.mamba.dt_bias"],
            "norm_scale": sd[f"{p}.mamba.norm.weight"],
            "out_proj": _lin_t(sd, f"{p}.mamba.out_proj.weight"),
        }
    else:
        blk["attn"] = {
            "q": _lin_t(sd, f"{p}.self_attn.q_proj.weight"),
            "k": _lin_t(sd, f"{p}.self_attn.k_proj.weight"),
            "v": _lin_t(sd, f"{p}.self_attn.v_proj.weight"),
            "o": _lin_t(sd, f"{p}.self_attn.o_proj.weight"),
        }
    if cfg.num_experts and f"{p}.block_sparse_moe.router.layer.weight" in sd:
        blk["moe"] = {
            "router": _lin_t(sd, f"{p}.block_sparse_moe.router.layer.weight"),
            "gate_up": np.ascontiguousarray(
                sd[f"{p}.block_sparse_moe.input_linear.weight"].transpose(0, 2, 1)
            ),
            "down": np.ascontiguousarray(
                sd[f"{p}.block_sparse_moe.output_linear.weight"].transpose(0, 2, 1)
            ),
        }
        blk["moe"]["shared"] = {
            "up": _lin_t(sd, f"{p}.shared_mlp.input_linear.weight"),
            "down": _lin_t(sd, f"{p}.shared_mlp.output_linear.weight"),
        }
    else:
        blk["mlp"] = {
            "up": _lin_t(sd, f"{p}.shared_mlp.input_linear.weight"),
            "down": _lin_t(sd, f"{p}.shared_mlp.output_linear.weight"),
        }
    return blk


# (prelude, per-block) converter pairs: the split lets the sharded loader
# stream one layer at a time (slice + quantize + free) so peak host memory
# stays near the SHARD size, not the checkpoint size (SURVEY §7-M6 per-host
# shard loading).
CONVERTER_PARTS: dict[str, tuple[Callable, Callable]] = {
    "gpt2": (_gpt2_prelude, _gpt2_block),
    "llama": (_llama_prelude, _llama_block),
    "mistral": (_llama_prelude, _llama_block),
    "falcon": (_falcon_prelude, _falcon_block),
    "granitemoe": (_granite_moe_prelude, _granite_moe_block),
    "granitemoeshared": (_granite_moe_prelude, _granite_moe_block),
    "granitemoehybrid": (_granite_hybrid_prelude, _granite_hybrid_block),
}


def _make_converter(prelude, block):
    def convert(sd: dict, cfg: ModelConfig) -> dict:
        params = prelude(sd, cfg)
        params["blocks"] = [block(sd, cfg, i) for i in range(cfg.num_layers)]
        return params

    return convert


CONVERTERS: dict[str, Callable[[dict, ModelConfig], dict]] = {
    name: _make_converter(*parts) for name, parts in CONVERTER_PARTS.items()
}
convert_gpt2 = CONVERTERS["gpt2"]
convert_llama = CONVERTERS["llama"]
convert_falcon = CONVERTERS["falcon"]
convert_granite_moe = CONVERTERS["granitemoe"]
convert_granite_hybrid = CONVERTERS["granitemoehybrid"]


# ---------------------------------------------------------------------------
# Quantization at load time
# ---------------------------------------------------------------------------

_QUANT_MIN_SIZE = 256 * 256  # leave tiny projections (routers etc.) dense


def quantize_params(params: dict, mode: str) -> dict:
    """Convert eligible dense linear weights to INT8/INT4. Embeddings, norms,
    Mamba SSM params and small matrices stay dense. MoE expert stacks
    ([X, in, out] / [X, in, out]-shaped 3D arrays) quantize per-expert
    per-out-channel at INT8 (r5 — the dense decode path streams EVERY
    expert per step, so expert bytes dominate MoE decode; INT4 experts stay
    dense pending a 3D nibble layout)."""
    if mode == "none":
        return params

    def quant_experts(w: np.ndarray) -> dict:
        # w [X, K, N] -> int8 qw + per-(expert, out-channel) scales [X, N].
        w = np.asarray(w, dtype=np.float32)
        amax = np.max(np.abs(w), axis=1)  # [X, N]
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        qw = np.clip(
            np.rint(w / scale[:, None, :]), -127, 127
        ).astype(np.int8)
        return {"qw": qw, "scale": scale}

    def walk(node, path=()):
        if isinstance(node, dict):
            if "w" in node and isinstance(node["w"], np.ndarray) and node["w"].ndim == 2:
                w = node["w"]
                name = path[-1] if path else ""
                if w.size >= _QUANT_MIN_SIZE and name not in ("router",):
                    return quant_ops.QuantLinear.from_dense(w, node.get("b"), mode)
            out = {}
            for k, v in node.items():
                if (
                    mode == "int8"
                    and path and path[-1] == "moe"
                    and k in ("gate_up", "down")
                    and isinstance(v, np.ndarray)
                    and v.ndim == 3
                ):
                    out[k] = quant_experts(v)
                else:
                    out[k] = walk(v, path + (k,))
            return out
        if isinstance(node, list):
            return [walk(v, path) for v in node]
        return node

    out = walk(params)
    # Tied-embedding models: materialize a quantized lm_head from embed^T so
    # decode streams int8/int4 instead of the bf16 vocab matrix each step
    # (the embedding gather itself stays full precision).
    if (
        "lm_head" not in out
        and isinstance(out.get("embed"), np.ndarray)
        and out["embed"].size >= _QUANT_MIN_SIZE
    ):
        out["lm_head"] = quant_ops.QuantLinear.from_dense(
            np.ascontiguousarray(out["embed"].T), None, mode
        )
    return out


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------


def load_model_dir(
    model_dir: str, dtype: str = "bfloat16", quantization: str = "none",
    use_quant_cache: bool = True, device: bool = True, fuse_qkv: bool = False,
) -> tuple[ModelConfig, dict]:
    """Load config + weights from an HF-format directory; returns
    (ModelConfig, params). Reference: LoadModelFromDirectory
    (generic_loader.go:1016-1039). Quantized weights are pre-packed to a
    sidecar cache (<dir>/.nv_quant_<mode>.pkl) so reloads skip
    re-quantization (SURVEY.md §5 checkpoint/resume).

    device=False keeps the params as a host numpy pytree — the sharded-runner
    path uses this so each host/device materializes only its own shards in
    device memory (shard_params' device_put transfers addressable shards
    only) instead of first staging a full replicated copy in HBM."""
    import pickle

    from nanovllm_tpu.models.model import to_device_params

    hf_cfg = load_hf_config(model_dir)
    # model_info.json overrides (written by cli/download_model; the reference
    # generic_loader reads it too): eos/bos and model_type trump config.json
    # when the export script recorded them explicitly.
    info_path = os.path.join(model_dir, "model_info.json")
    if os.path.exists(info_path):
        with open(info_path) as f:
            info = json.load(f)
        for key in ("eos_token_id", "bos_token_id", "model_type"):
            if info.get(key) is not None:
                hf_cfg[key] = info[key]
    cfg = model_config_from_hf(hf_cfg, dtype=dtype)

    def finish(params):
        # device=False still applies the dtype policy, host-side, so the
        # sharded path transfers bf16 shards (not fp32) straight to devices.
        return cfg, to_device_params(params, cfg, device=device)

    suffix = "_fqkv" if fuse_qkv else ""
    # p2: mixed int4 nibble encoding (ops/quant.py) — stale caches from the
    # signed-nibble packing would silently dequantize wrong.
    cache_path = os.path.join(model_dir, f".nv_quant_{quantization}{suffix}_p2.pkl")
    if quantization != "none" and use_quant_cache and os.path.exists(cache_path):
        with open(cache_path, "rb") as f:
            return finish(pickle.load(f))

    sd = read_safetensors_dir(model_dir)
    converter = CONVERTERS[cfg.model_type]
    params = converter(sd, cfg)
    params["rope_inv_freq"] = compute_inv_freq(cfg.rotary_dim, cfg.rope_theta, cfg.rope_scaling)
    if fuse_qkv:
        from nanovllm_tpu.models.model import fuse_qkv_params

        params = fuse_qkv_params(params)
    params = quantize_params(params, quantization)
    if quantization != "none" and use_quant_cache:
        try:
            with open(cache_path, "wb") as f:
                pickle.dump(params, f)
        except OSError:
            pass
    return finish(params)
