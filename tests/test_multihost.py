"""2-process multi-host serving test on CPU meshes (SURVEY.md §7-M6
acceptance without a real cluster): two jax.distributed processes, 4 virtual
devices each, tp=4 x dp=2 global mesh, the replicated-scheduler MultiHostLLM
driver end-to-end — and the result must equal a single-process run."""

import ast
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(nproc: int, timeout: int = 240) -> list[str]:
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(pid), str(nproc), str(port)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{stderr[-4000:]}"
        outs.append(stdout)
    return outs


def test_two_process_spmd_generation_matches_single_process():
    outs = _run_workers(2)
    tokens = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("TOKENS["):
                pid = int(line[7])
                tokens[pid] = ast.literal_eval(line.split("] ", 1)[1])
    assert set(tokens) == {0, 1}
    # Every host computed the identical outputs (replicated scheduler +
    # deterministic SPMD program).
    assert tokens[0] == tokens[1]
    assert len(tokens[0]) == 3 and all(len(t) == 6 for t in tokens[0])

    # Idle-step sync must take the scalar fast path on every host (the
    # payload broadcast is ~ms-scale; the scalar op is tens of us on the
    # loopback CPU backend — assert it stays well under payload cost).
    idle_us = [
        float(line.split("] ", 1)[1][:-2])
        for out in outs
        for line in out.splitlines()
        if line.startswith("IDLESYNC[")
    ]
    assert len(idle_us) == 2 and all(v < 5000 for v in idle_us), idle_us

    # Single-process reference (worker with nproc=1 runs tp=4 dp=1 on the
    # in-process virtual mesh).
    ref = _run_workers(1)
    ref_tokens = None
    for line in ref[0].splitlines():
        if line.startswith("TOKENS[0]"):
            ref_tokens = ast.literal_eval(line.split("] ", 1)[1])
    assert ref_tokens == tokens[0]
