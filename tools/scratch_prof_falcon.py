"""Profile one Falcon-7B INT4 decode burst; summarize device ops (same
methodology as scratch_prof.py — run on the chip, prints the top-op table
that guides kernel work)."""
import glob
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from nanovllm_tpu.config import (
    ActivationType, BlockStyle, EngineConfig, ModelConfig, NormType, PositionType,
)
from nanovllm_tpu.engine.llm import LLM
from nanovllm_tpu.models import model as M
from nanovllm_tpu.sampling_params import SamplingParams

cfg = ModelConfig(
    vocab_size=65024, hidden_size=4544, num_layers=32, num_heads=71,
    num_kv_heads=1, head_dim=64, intermediate_size=18176, max_seq_len=2048,
    norm_type=NormType.LAYERNORM, position_type=PositionType.ROPE,
    activation=ActivationType.GELU, block_style=BlockStyle.PARALLEL,
    tie_word_embeddings=True, dtype="bfloat16", model_type="falcon", eos_token_id=11,
)
B, PROMPT, DECODE = 32, 128, 64

with open("/tmp/nanovllm_bench_falcon7b_int4_v3.pkl", "rb") as f:
    params_np = pickle.load(f)
params_np = M.fuse_qkv_params(params_np)
params = M.to_device_params(params_np, cfg)

ecfg = EngineConfig(
    max_num_batched_tokens=4096, max_num_seqs=B, max_model_len=512,
    kv_block_size=128, kv_pool_bytes=1 << 30, max_decode_slots=B,
    min_prefill_bucket=128, eos_token_id=11, quantization="int4",
    enable_prefix_caching=False, decode_burst=32,
)
llm = LLM(model_config=cfg, engine_config=ecfg, params=params)
eng = llm.engine
rng = np.random.default_rng(0)
prompts = [rng.integers(1, cfg.vocab_size, size=PROMPT).tolist() for _ in range(B)]
sp = SamplingParams(temperature=0.0, max_tokens=DECODE, ignore_eos=True)

print("warmup (compiling)...", file=sys.stderr)
for p in prompts:
    eng.add_request(p, sp)
while not eng.is_finished():
    eng.step()

for p in prompts:
    eng.add_request(p, sp)
# prefill step + one decode burst; leaves exactly one full burst for the trace
for _ in range(2):
    if not eng.is_finished():
        eng.step()

trace_dir = "/tmp/nvtrace_falcon"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(1):
        if not eng.is_finished():
            eng.step()
while not eng.is_finished():
    eng.step()

files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
print("xplane files:", files, file=sys.stderr)
if not files:
    sys.exit(1)
from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

data, _ = rtd.xspace_to_tool_data(files, "trace_viewer^", {})
tr = json.loads(data)
evs = tr["traceEvents"] if isinstance(tr, dict) else tr
names = {}
for e in evs:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"]["name"]
dev_pids = {p for p, n in names.items() if "TPU" in n or "device" in n.lower()}
agg = {}
for e in evs:
    if e.get("ph") == "X" and e.get("pid") in dev_pids:
        agg.setdefault(e["name"], [0, 0.0])
        agg[e["name"]][0] += 1
        agg[e["name"]][1] += e.get("dur", 0)
top = sorted(agg.items(), key=lambda kv: -kv[1][1])[:40]
tot = sum(v[1] for v in agg.values())
print(f"total device event time: {tot/1e3:.2f} ms (2 engine steps)")
for name, (n, dur) in top:
    print(f"{dur/1e3:9.3f} ms  x{n:5d}  {name[:110]}")
