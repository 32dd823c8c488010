"""Per-host checkpoint shard loading (SURVEY §7-M6 'per-host weight-shard
loading'; VERDICT r2 missing #3).

Multi-process serving previously had every host read, convert and quantize
the FULL checkpoint (for Falcon-7B that is ~13 GB of host RAM and minutes of
quantization work per host) even though each host's devices only hold a
slice. This loader streams the checkpoint ONE LAYER AT A TIME (the converter
split in io/loader.py: prelude + per-block functions), slices each block to
the model-axis range covered by this process's addressable devices (the same
divisibility rules as parallel/shardings.shard_params), quantizes ONLY the
local shard, and frees the full-precision layer before reading the next.
Peak host memory ≈ shard size + one fp32 layer; quantization work scales
with the shard fraction. Global jax.Arrays are assembled with
jax.make_array_from_process_local_data, so no full replicated copy ever
stages in HBM either.

Quantized sharding caveat: a sliced weight is only sharded when the LOCAL
slice needs no storage padding ((dim/tp) % 128 == 0) — otherwise per-shard
pad columns/rows would interleave inside the assembled global matrix and
misalign the fused kernel's unpad/contraction. Misfits degrade to
replicated, exactly like shard_params' divisibility fallback.

The reference has no counterpart (single process, fp32 in host RAM —
/root/reference/purego/tensor/generic_loader.go:184-265).
"""

from __future__ import annotations

import numpy as np

from nanovllm_tpu.config import ModelConfig
from nanovllm_tpu.parallel.mesh import MODEL_AXIS

COL, ROW, EP, REP = "col", "row", "ep", "rep"  # leaf shard kinds


class LazySD:
    """Dict-like view over a checkpoint's safetensors files: tensors are
    read (and dtype-converted) on access and never cached, so the caller
    controls lifetime. `bytes_read` counts raw checkpoint bytes served."""

    def __init__(self, model_dir: str):
        import json
        import os

        from safetensors import safe_open

        self._handles = {}
        self._key_to_file: dict[str, str] = {}
        index_path = os.path.join(model_dir, "model.safetensors.index.json")
        if os.path.exists(index_path):
            with open(index_path) as f:
                index = json.load(f)
            files = sorted(set(index["weight_map"].values()))
        else:
            files = sorted(
                f for f in os.listdir(model_dir) if f.endswith(".safetensors")
            )
            if not files:
                raise FileNotFoundError(f"no safetensors files in {model_dir}")
        for fname in files:
            h = safe_open(os.path.join(model_dir, fname), framework="np")
            self._handles[fname] = h
            for k in h.keys():
                self._key_to_file[k] = fname
        self.bytes_read = 0

    def keys(self):
        return self._key_to_file.keys()

    def __contains__(self, k: str) -> bool:
        return k in self._key_to_file

    def __getitem__(self, k: str) -> np.ndarray:
        h = self._handles[self._key_to_file[k]]
        t = h.get_tensor(k)
        self.bytes_read += t.nbytes
        if t.dtype == np.float16 or str(t.dtype) == "bfloat16":
            t = t.astype(np.float32)
        return t

    def get(self, k: str, default=None):
        return self[k] if k in self else default


def process_model_range(mesh) -> tuple[int, int, int]:
    """(lo, hi, tp): the contiguous model-axis index range covered by this
    process's addressable devices. Falls back to the full range when the
    process's devices span a non-contiguous set (unusual topologies) or
    cover everything (single process / pure-DP meshes)."""
    import jax

    tp = dict(mesh.shape)[MODEL_AXIS]
    mi = list(mesh.axis_names).index(MODEL_AXIS)
    pid = jax.process_index()
    cols = sorted(
        {idx[mi] for idx, d in np.ndenumerate(mesh.devices) if d.process_index == pid}
    )
    if not cols:
        return 0, tp, tp
    lo, hi = cols[0], cols[-1] + 1
    if cols != list(range(lo, hi)):
        return 0, tp, tp
    return lo, hi, tp


class _Slicer:
    """Applies shard_params' divisibility rules (+ the quantized-padding
    alignment guard) and records the spec kind chosen for every linear."""

    def __init__(self, cfg: ModelConfig, lo: int, hi: int, tp: int, quant: str):
        self.cfg, self.lo, self.hi, self.tp = cfg, lo, hi, tp
        self.quant = quant

    def _fits(self, n: int) -> bool:
        if n % self.tp:
            return False
        if self.quant != "none" and (n // self.tp) % 128 != 0:
            return False
        return True

    def cols(self, p: dict) -> tuple[dict, str]:
        n = p["w"].shape[-1]
        if not self._fits(n):
            return p, REP
        s = slice((self.lo * n) // self.tp, (self.hi * n) // self.tp)
        out = {"w": p["w"][..., s]}
        if p.get("b") is not None:
            out["b"] = p["b"][s]
        return out, COL

    def rows(self, p: dict) -> tuple[dict, str]:
        n = p["w"].shape[0]
        if not self._fits(n):
            return p, REP
        s = slice((self.lo * n) // self.tp, (self.hi * n) // self.tp)
        out = {"w": p["w"][s]}
        if p.get("b") is not None:
            out["b"] = p["b"]  # row-parallel bias is replicated (post-psum)
        return out, ROW

    def experts(self, w: np.ndarray) -> tuple[np.ndarray, str]:
        x = w.shape[0]
        if x % self.tp:
            return w, REP
        s = slice((self.lo * x) // self.tp, (self.hi * x) // self.tp)
        return w[s], EP

    def block(self, blk: dict) -> tuple[dict, dict]:
        """Returns (sliced block, spec-kind tree)."""
        cfg = self.cfg
        heads_ok = cfg.num_heads % self.tp == 0
        kv_ok = cfg.num_kv_heads % self.tp == 0
        out: dict = {}
        spec: dict = {}
        for name in ("ln1", "ln2"):
            if name in blk:
                out[name] = blk[name]
        if "attn" in blk:
            a = blk["attn"]
            q, sq = self.cols(a["q"]) if heads_ok else (a["q"], REP)
            k, sk = self.cols(a["k"]) if kv_ok else (a["k"], REP)
            v, sv = self.cols(a["v"]) if kv_ok else (a["v"], REP)
            o, so = self.rows(a["o"]) if heads_ok else (a["o"], REP)
            out["attn"] = {"q": q, "k": k, "v": v, "o": o}
            spec["attn"] = {"q": sq, "k": sk, "v": sv, "o": so}
        if "mlp" in blk:
            up, su = self.cols(blk["mlp"]["up"])
            down, sd_ = self.rows(blk["mlp"]["down"])
            out["mlp"] = {"up": up, "down": down}
            spec["mlp"] = {"up": su, "down": sd_}
        if "moe" in blk:
            m = blk["moe"]
            gu, sg = self.experts(m["gate_up"])
            dn, sdn = self.experts(m["down"])
            out["moe"] = {"router": m["router"], "gate_up": gu, "down": dn}
            spec["moe"] = {"router": REP, "gate_up": sg, "down": sdn}
            if "shared" in m:
                u, su = self.cols(m["shared"]["up"])
                d, sd2 = self.rows(m["shared"]["down"])
                out["moe"]["shared"] = {"up": u, "down": d}
                spec["moe"]["shared"] = {"up": su, "down": sd2}
        if "mamba" in blk:
            out["mamba"] = blk["mamba"]  # replicated (shardings.py keeps SSM whole)
        return out, spec


def load_host_shard(
    model_dir: str,
    mesh,
    dtype: str = "bfloat16",
    quantization: str = "none",
) -> tuple[ModelConfig, dict, dict]:
    """Stream-load this process's weight shard. Returns (cfg, host-local
    numpy pytree, spec-kind tree) for assemble_global_params."""
    from nanovllm_tpu.io.hf_config import load_hf_config, model_config_from_hf
    from nanovllm_tpu.io.loader import CONVERTER_PARTS, quantize_params
    from nanovllm_tpu.models.model import to_device_params
    from nanovllm_tpu.ops.quant import QuantLinear
    from nanovllm_tpu.ops.rope import compute_inv_freq

    hf_cfg = load_hf_config(model_dir)
    cfg = model_config_from_hf(hf_cfg, dtype=dtype)
    sd = LazySD(model_dir)
    lo, hi, tp = process_model_range(mesh)
    sl = _Slicer(cfg, lo, hi, tp, quantization)
    prelude, block_fn = CONVERTER_PARTS[cfg.model_type]

    params = prelude(sd, cfg)
    specs: dict = {"blocks": []}
    if "lm_head" in params:
        params["lm_head"], specs["lm_head"] = sl.cols(params["lm_head"])
    blocks = []
    for i in range(cfg.num_layers):
        blk, spec = sl.block(block_fn(sd, cfg, i))
        blk = quantize_params(blk, quantization)
        blocks.append(to_device_params(blk, cfg, device=False))
        specs["blocks"].append(spec)
    rest = {k: v for k, v in params.items() if k != "blocks"}
    rest = quantize_params(rest, quantization)
    if "lm_head" in rest and "lm_head" not in specs:
        # Tied lm_head materialized by quantize_params from embed^T: slice
        # its columns like any output projection (vocab permitting).
        lh = rest["lm_head"]
        n = lh.qw.shape[1]
        if isinstance(lh, QuantLinear) and n % tp == 0 and (n // tp) % 128 == 0:
            s = slice((lo * n) // tp, (hi * n) // tp)
            rest["lm_head"] = QuantLinear(
                lh.qw[:, s], lh.scale[..., s], None, lh.mode, lh.n_in,
                (hi - lo) * n // tp,
            )
            specs["lm_head"] = COL
        else:
            specs["lm_head"] = REP
    params = to_device_params(rest, cfg, device=False)
    params["blocks"] = blocks
    params["rope_inv_freq"] = np.asarray(
        compute_inv_freq(cfg.rotary_dim, cfg.rope_theta, cfg.rope_scaling)
    )
    return cfg, params, specs


def assemble_global_params(params_local: dict, specs: dict, cfg: ModelConfig, mesh) -> dict:
    """Host-local shard pytree + spec kinds -> global sharded jax.Arrays,
    transferring only this process's data."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nanovllm_tpu.ops.quant import QuantLinear

    lo, hi, tp = process_model_range(mesh)
    frac = tp // max(hi - lo, 1)

    KIND_W = {COL: P(None, MODEL_AXIS), ROW: P(MODEL_AXIS, None),
              EP: P(MODEL_AXIS, None, None), REP: None}

    def put(x, spec: P | None):
        x = np.asarray(x)
        if spec is None:
            spec = P(*([None] * x.ndim))
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_process_local_data(sh, x)

    def lin(p, kind: str):
        w_spec = KIND_W[kind]
        out_axis = None if kind in (REP, ROW) else MODEL_AXIS
        if isinstance(p, QuantLinear):
            if p.mode == "int8":
                scale_spec = P(out_axis)  # per-out-channel
            else:
                # INT4 scales are [K/group, N]: rows follow a ROW-sharded
                # contraction dim, cols follow a COL-sharded out dim.
                scale_spec = (
                    P(MODEL_AXIS, None) if kind == ROW else P(None, out_axis)
                )
            n_in = p.n_in * (frac if kind == ROW else 1)
            n_out = p.n_out * (frac if kind == COL else 1)
            return QuantLinear(
                put(p.qw, w_spec), put(p.scale, scale_spec),
                None if p.b is None else put(p.b, P(out_axis)),
                p.mode, n_in, n_out,
            )
        out = {"w": put(p["w"], w_spec)}
        if p.get("b") is not None:
            out["b"] = put(p["b"], P(out_axis))
        return out

    rep_put = lambda v: put(v, None)  # noqa: E731

    out = {
        "embed": rep_put(params_local["embed"]),
        "final_norm": {k: rep_put(v) for k, v in params_local["final_norm"].items()},
        "rope_inv_freq": rep_put(params_local["rope_inv_freq"]),
        "blocks": [],
    }
    if "pos_embed" in params_local:
        out["pos_embed"] = rep_put(params_local["pos_embed"])
    if "lm_head" in params_local:
        out["lm_head"] = lin(params_local["lm_head"], specs.get("lm_head", REP))

    for blk, spec in zip(params_local["blocks"], specs["blocks"]):
        b: dict = {}
        for name in ("ln1", "ln2"):
            if name in blk:
                b[name] = {k: rep_put(v) for k, v in blk[name].items()}
        if "attn" in blk:
            b["attn"] = {
                k: lin(blk["attn"][k], spec["attn"][k]) for k in ("q", "k", "v", "o")
            }
        if "mlp" in blk:
            b["mlp"] = {
                "up": lin(blk["mlp"]["up"], spec["mlp"]["up"]),
                "down": lin(blk["mlp"]["down"], spec["mlp"]["down"]),
            }
        if "moe" in blk:
            m, ms = blk["moe"], spec["moe"]
            b["moe"] = {
                "router": lin(m["router"], REP),
                "gate_up": put(m["gate_up"], KIND_W[ms["gate_up"]]),
                "down": put(m["down"], KIND_W[ms["down"]]),
            }
            if "shared" in m:
                b["moe"]["shared"] = {
                    "up": lin(m["shared"]["up"], ms["shared"]["up"]),
                    "down": lin(m["shared"]["down"], ms["shared"]["down"]),
                }
        if "mamba" in blk:
            b["mamba"] = {k: rep_put(v) for k, v in blk["mamba"].items()}
        out["blocks"].append(b)
    return out
