"""Per-host checkpoint shard loading (VERDICT r2 missing #3 / SURVEY §7-M6):
each process reads/retains only the weight slice its devices hold, and the
assembled global params generate identically to the full-load path."""

import ast
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_llama_ckpt(tmp_path_factory):
    """Tiny Llama checkpoint with tp=8-divisible dims (heads 8, kv 8,
    2*inter 1024, vocab 256)."""
    out = str(tmp_path_factory.mktemp("ckpt") / "tiny-llama")
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    m = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=256, hidden_size=64, intermediate_size=512,
            num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
            max_position_embeddings=128, tie_word_embeddings=False,
            eos_token_id=int(2),
        )
    ).eval()
    m.save_pretrained(out, safe_serialization=True)
    return out


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_shard_load_matches_full_load(tiny_llama_ckpt):
    """Single process, tp=8 mesh: shard-loaded global params must generate
    the same greedy tokens as the ordinary full-load + shard_params path."""
    from nanovllm_tpu.config import EngineConfig
    from nanovllm_tpu.engine.llm import LLM
    from nanovllm_tpu.engine.runner import TPUModelRunner
    from nanovllm_tpu.io.loader import load_model_dir
    from nanovllm_tpu.io.shard_loader import assemble_global_params, load_host_shard
    from nanovllm_tpu.parallel import make_mesh
    from nanovllm_tpu.sampling_params import SamplingParams

    ecfg = EngineConfig(
        max_num_batched_tokens=4096, max_num_seqs=4, max_model_len=64,
        kv_block_size=16, max_decode_slots=4, min_prefill_bucket=16,
        num_kv_blocks=32, eos_token_id=2, decode_burst=2,
    )
    prompts = [[3, 4, 5, 6], [9, 10, 11]]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    cfg_full, params_full = load_model_dir(tiny_llama_ckpt)
    r1 = TPUModelRunner(cfg_full, ecfg, params=params_full)
    out1 = LLM(model_config=cfg_full, engine_config=ecfg, runner=r1).generate(prompts, sp)

    mesh = make_mesh(tp_size=8, dp_size=1)
    cfg, local, specs = load_host_shard(tiny_llama_ckpt, mesh)
    with mesh:
        params = assemble_global_params(local, specs, cfg, mesh)
        # Sliceable weights are genuinely model-axis sharded.
        qw = params["blocks"][0]["attn"]["q"]["w"]
        assert len(qw.sharding.device_set) == 8
        assert qw.sharding.spec[-1] == "model"
        r2 = TPUModelRunner(cfg, ecfg, params=params, mesh=mesh, params_global=True)
        out2 = LLM(model_config=cfg, engine_config=ecfg, runner=r2).generate(prompts, sp)

    for a, b in zip(out1, out2):
        assert a.token_ids == b.token_ids


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_loads_half_each(tiny_llama_ckpt):
    """tp=8 over 2 processes: each worker retains ~its shard, not the
    checkpoint (the VERDICT 'Done' criterion), and outputs agree."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "shard_loader_worker.py"),
             str(pid), "2", str(port), tiny_llama_ckpt],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{stderr[-4000:]}"
        outs.append(stdout)

    vals = {}
    for out in outs:
        for line in out.splitlines():
            for tag in ("RANGE", "LOCALBYTES", "TOKENS"):
                if line.startswith(f"{tag}["):
                    pid = int(line[len(tag) + 1])
                    vals[(tag, pid)] = ast.literal_eval(line.split("] ", 1)[1])
    # Each process covers half the model axis.
    assert vals[("RANGE", 0)] == (0, 4, 8)
    assert vals[("RANGE", 1)] == (4, 8, 8)
    # Retained bytes ≈ shard: strictly under 75% of a full load (the
    # sliceable majority halves; embeddings/norms stay replicated).
    full = _full_load_bytes(tiny_llama_ckpt)
    for pid in (0, 1):
        assert vals[("LOCALBYTES", pid)] < 0.75 * full, (vals[("LOCALBYTES", pid)], full)
    # Both hosts computed identical outputs.
    assert vals[("TOKENS", 0)] == vals[("TOKENS", 1)]


def _full_load_bytes(ckpt) -> int:
    from nanovllm_tpu.io.loader import load_model_dir

    _, params = load_model_dir(ckpt, device=False)
    total = 0

    def walk(n):
        nonlocal total
        if isinstance(n, dict):
            for v in n.values():
                walk(v)
        elif isinstance(n, list):
            for v in n:
                walk(v)
        elif hasattr(n, "nbytes"):
            total += n.nbytes

    walk(params)
    return total
