"""Partition specs: tensor parallelism over attention heads / FFN inner dim,
expert parallelism over MoE experts, KV-pool sharding over KV heads.

Megatron-style column/row split expressed as NamedShardings; XLA GSPMD
propagates them through the jitted step and inserts the ICI collectives
(the reduce after o-proj/down-proj row-parallel matmuls). MQA (Falcon,
num_kv_heads == 1) keeps K/V replicated and shards only Q heads — the
Falcon-head-count caveat from SURVEY.md §7-M5.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nanovllm_tpu.config import ModelConfig
from nanovllm_tpu.ops.quant import QuantLinear
from nanovllm_tpu.parallel.mesh import MODEL_AXIS


def _put(x, mesh: Mesh, spec: P):
    # Auto-pad the spec with leading None axes for higher-rank leaves (layer-
    # stacked params carry a leading L axis), and replicate any dim whose
    # size the mesh axis doesn't divide (odd vocab, Falcon's 71 heads).
    spec = tuple(spec)
    if len(spec) < x.ndim:
        spec = (None,) * (x.ndim - len(spec)) + spec
    fixed = []
    for i, ax in enumerate(spec):
        if ax is None:
            fixed.append(None)
        else:
            n = mesh.shape[ax]
            fixed.append(ax if x.shape[i] % n == 0 else None)
    return jax.device_put(x, NamedSharding(mesh, P(*fixed)))


def _lin(p, mesh, w_spec: P):
    """Shard a linear param container (dense dict or QuantLinear). Bias/scale
    follow the output-dim sharding of the weight."""
    out_axis = w_spec[-1]
    if isinstance(p, QuantLinear):
        if p.mode == "int8":
            scale_spec = P(out_axis)
        else:  # int4 scales are [groups, N]
            scale_spec = P(None, out_axis)
        return QuantLinear(
            _put(p.qw, mesh, w_spec),
            _put(p.scale, mesh, scale_spec),
            None if p.b is None else _put(p.b, mesh, P(out_axis)),
            p.mode, p.n_in, p.n_out,
        )
    out = {"w": _put(p["w"], mesh, w_spec)}
    if p.get("b") is not None:
        out["b"] = _put(p["b"], mesh, P(out_axis))
    return out


def _norm(p, mesh):
    return {k: _put(v, mesh, P(None)) for k, v in p.items()}


def shard_params(params: dict, cfg: ModelConfig, mesh: Mesh) -> dict:
    """Column-parallel q/k/v & up (out dim sharded), row-parallel o & down
    (in dim sharded); experts sharded expert-major (EP); embeddings and norms
    replicated."""
    tp = mesh.shape[MODEL_AXIS]
    col = P(None, MODEL_AXIS)
    row = P(MODEL_AXIS, None)
    rep2 = P(None, None)

    def shard_kv_spec():
        # MQA / small KV-head counts: replicate K/V projections.
        return col if cfg.num_kv_heads % tp == 0 else rep2

    out = {
        "embed": _put(params["embed"], mesh, rep2),
        "final_norm": _norm(params["final_norm"], mesh),
        "rope_inv_freq": _put(params["rope_inv_freq"], mesh, P(None)),
        "blocks": [],
    }
    if "pos_embed" in params:
        out["pos_embed"] = _put(params["pos_embed"], mesh, rep2)
    if "lm_head" in params:
        out["lm_head"] = _lin(params["lm_head"], mesh, col)

    q_col = col if cfg.num_heads % tp == 0 else rep2
    q_row = row if cfg.num_heads % tp == 0 else rep2
    kv_col = shard_kv_spec()

    blocks = params["blocks"]
    stacked = not isinstance(blocks, list)
    for blk in (blocks if not stacked else [blocks]):
        b: dict = {}
        for name in ("ln1", "ln2"):
            if name in blk:
                b[name] = _norm(blk[name], mesh)
        if "attn" in blk:
            b["attn"] = {
                "q": _lin(blk["attn"]["q"], mesh, q_col),
                "k": _lin(blk["attn"]["k"], mesh, kv_col),
                "v": _lin(blk["attn"]["v"], mesh, kv_col),
                "o": _lin(blk["attn"]["o"], mesh, q_row),
            }
        if "mlp" in blk:
            b["mlp"] = {
                "up": _lin(blk["mlp"]["up"], mesh, col),
                "down": _lin(blk["mlp"]["down"], mesh, row),
            }
        if "moe" in blk:
            ep = P(MODEL_AXIS, None, None) if cfg.num_experts % tp == 0 else P(None, None, None)
            def _experts(w):
                if isinstance(w, dict):  # INT8 expert stack {qw, scale}
                    return {
                        "qw": _put(w["qw"], mesh, ep),
                        "scale": _put(w["scale"], mesh, P(ep[0], None)),
                    }
                return _put(w, mesh, ep)

            b["moe"] = {
                "router": _lin(blk["moe"]["router"], mesh, rep2),
                "gate_up": _experts(blk["moe"]["gate_up"]),
                "down": _experts(blk["moe"]["down"]),
            }
            if "shared" in blk["moe"]:
                b["moe"]["shared"] = {
                    "up": _lin(blk["moe"]["shared"]["up"], mesh, col),
                    "down": _lin(blk["moe"]["shared"]["down"], mesh, row),
                }
        if "mamba" in blk:
            # SSM state mixes across the whole inner dim through the scan;
            # keep Mamba layers replicated for now (they are O(N) cheap).
            b["mamba"] = jax.tree_util.tree_map(lambda x: _put(x, mesh, P(*([None] * x.ndim))), blk["mamba"])
        out["blocks"].append(b)
    if stacked:
        out["blocks"] = out["blocks"][0]
    return out


def pool_specs(cfg: ModelConfig, mesh: Mesh, quantized: bool) -> dict:
    tp = mesh.shape[MODEL_AXIS]
    kv_axis = MODEL_AXIS if cfg.num_kv_heads % tp == 0 else None
    # Pool layout is flat [L*slots, Hkv*D] (heads folded into the minor dim);
    # sharding the folded dim over 'model' splits on head boundaries because
    # Hkv % tp == 0. Scales are [Hkv, L*slots].
    val = P(None, kv_axis)
    scale = P(kv_axis, None)
    d = {"k": val, "v": val}
    if quantized:
        d["k_scale"] = scale
        d["v_scale"] = scale
    return d


def shard_pool(pool: dict, cfg: ModelConfig, mesh: Mesh) -> dict:
    specs = pool_specs(cfg, mesh, "k_scale" in pool)
    return {k: _put(v, mesh, specs[k]) for k, v in pool.items()}


def shard_mamba_state(state: dict, mesh: Mesh) -> dict:
    return jax.tree_util.tree_map(
        lambda x: _put(x, mesh, P(*([None] * x.ndim))), state
    )
