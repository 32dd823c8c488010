"""Multi-host SPMD serving support.

New capability relative to the reference (which has no distributed anything —
SURVEY.md §2 'Distributed communication backend: NONE'). Design (SURVEY.md
§7-M6): every host runs an IDENTICAL engine — same scheduler code, same
deterministic decisions — against the same request log, so all hosts issue
the same sharded device program each step and XLA's collectives ride
ICI within a slice and DCN across hosts. There is no control-plane server:
host 0 is the request ingress, and each batch of new requests is broadcast
to all hosts before scheduling (`broadcast_requests`), after which
scheduling is pure deterministic replay.

Determinism requirements (enforced by construction):
  - Sequence ids from the shared arrival order (requests are (prompt, params)
    tuples broadcast in order).
  - BlockManager/Scheduler decisions depend only on config + request log.
  - Sampling seeds derive from per-request seed/seq-id, never host RNG.
"""

from __future__ import annotations

import json
import pickle
from typing import Any, Optional

import numpy as np

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """Initialize jax.distributed (no-op for single-process). Returns
    (process_id, num_processes)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def broadcast_payload(payload: Any, is_source: bool) -> Any:
    """Broadcast an arbitrary picklable payload from host 0 to all hosts via
    a device all-gather (multihost_utils). Single-process: identity."""
    if jax.process_count() == 1:
        return payload
    from jax.experimental import multihost_utils

    data = pickle.dumps(payload if is_source else None)
    # Length-prefix into a fixed-size uint8 buffer negotiated by max length.
    n = np.int64(len(data)) if is_source else np.int64(0)
    n = int(multihost_utils.broadcast_one_to_all(n))
    buf = np.zeros((n,), np.uint8)
    if is_source:
        buf[:] = np.frombuffer(data, np.uint8)
    buf = multihost_utils.broadcast_one_to_all(buf)
    return pickle.loads(buf.tobytes())


class RequestLog:
    """Append-only shared request log. Host 0 appends locally; `sync()`
    broadcasts the tail to every host so all schedulers see the identical
    ordered stream."""

    def __init__(self):
        self.entries: list[tuple[list[int], dict]] = []
        self._synced = 0

    def append(self, token_ids: list[int], sampling_params: dict) -> None:
        assert jax.process_index() == 0, "requests enter at host 0"
        self.entries.append((list(token_ids), dict(sampling_params)))

    def sync(self) -> list[tuple[list[int], dict]]:
        """Broadcast unsynced entries; returns the new entries every host
        must enqueue (in order). Fast path: a single scalar collective
        ("n new requests") decides whether the pickle broadcast happens at
        all — idle steps (the common case mid-generation) pay one scalar
        op instead of a length negotiation + payload broadcast per step."""
        is_src = jax.process_index() == 0
        if jax.process_count() == 1:
            tail = self.entries[self._synced :]
            self._synced = len(self.entries)
            return tail
        from jax.experimental import multihost_utils

        n = np.int64(len(self.entries) - self._synced) if is_src else np.int64(0)
        n = int(multihost_utils.broadcast_one_to_all(n))
        if n == 0:
            return []
        tail = self.entries[self._synced :] if is_src else None
        tail = broadcast_payload(tail, is_src)
        if not is_src:
            self.entries.extend(tail)
        self._synced = len(self.entries)
        return tail


class MultiHostLLM:
    """Replicated-scheduler multi-host serving driver (SURVEY.md §7-M6).

    Every process constructs this collectively with IDENTICAL configs; each
    builds the same `LLM` engine over the same global mesh (TP/EP shards ride
    ICI within a slice, the replicated batch rides DCN). Requests enter at
    host 0 (`add_request`); each `step()` first syncs the request log so all
    hosts enqueue the identical request stream, then runs the identical
    deterministic scheduler, so every host dispatches the same SPMD program.
    Outputs are computed identically on every host (sampled tokens come from
    the same deterministic device program) — host 0 is conventionally the one
    that surfaces them to users.

    Determinism invariants (all enforced by construction):
      - sequence ids: every host creates Sequences in log order only;
      - scheduling: depends only on (config, request log);
      - sampling: seeds derive from request seed / sequence id, never host RNG.
    """

    def __init__(
        self,
        model: Optional[str] = None,
        engine_config=None,
        model_config=None,
        params=None,
        tokenizer=None,
    ):
        from nanovllm_tpu.config import EngineConfig
        from nanovllm_tpu.engine.llm import LLM

        self.process_id = jax.process_index()
        self.num_processes = jax.process_count()
        ecfg = engine_config or EngineConfig()
        if ecfg.tensor_parallel_size * ecfg.data_parallel_size <= 1:
            # Default: TP over every chip in the job.
            ecfg = ecfg.replace(tensor_parallel_size=len(jax.devices()))
        # The facade builds the global mesh from tensor/data_parallel_size and
        # loads checkpoints host-side so each process materializes only its
        # addressable shards in device memory.
        self.llm = LLM(
            model=model, engine_config=ecfg, model_config=model_config,
            params=params, tokenizer=tokenizer,
        )
        self.mesh = self.llm.engine.runner.mesh
        self.engine = self.llm.engine
        self.log = RequestLog()
        self._arrival_order: list[int] = []  # seq ids in log order (all hosts)

    # -- request intake (host 0) ------------------------------------------

    def add_request(self, prompt, sampling_params) -> None:
        """Host 0 only: tokenize (if str) and append to the shared log. The
        request reaches every host's engine at the next step()."""
        assert self.process_id == 0, "requests enter at host 0"
        token_ids = (
            self.engine.tokenizer.encode(prompt) if isinstance(prompt, str) else list(prompt)
        )
        self.log.append(token_ids, _sp_to_dict(sampling_params))

    # -- collective step loop ---------------------------------------------

    def step(self):
        """Collective: sync the request log, enqueue new requests, run one
        engine step. Every host must call this the same number of times."""
        for token_ids, sp_dict in self.log.sync():
            sid = self.engine.add_request(token_ids, _sp_from_dict(sp_dict))
            self._arrival_order.append(sid)
        return self.engine.step()

    def is_finished(self) -> bool:
        return self.engine.is_finished()

    def generate(self, prompts=None, sampling_params=None):
        """Collective batch generation. Host 0 passes prompts/params; other
        hosts pass None and participate in the step loop. Returns outputs in
        request order on every host."""
        from nanovllm_tpu.sampling_params import SamplingParams

        if self.process_id == 0:
            assert prompts is not None
            sps = sampling_params or SamplingParams()
            if isinstance(sps, SamplingParams):
                sps = [sps] * len(prompts)
            for p, sp in zip(prompts, sps):
                self.add_request(p, sp)
        outputs = {}
        n_expected = broadcast_payload(
            len(prompts) if self.process_id == 0 else None, self.process_id == 0
        )
        while len(outputs) < n_expected:
            for out in self.step():
                outputs[out.seq_id] = out
        order = {sid: i for i, sid in enumerate(self._arrival_order[-n_expected:])}
        results = [None] * n_expected
        for sid, out in outputs.items():
            results[order[sid]] = out
        return results

    def close(self):
        self.llm.close()


def _sp_to_dict(sp) -> dict:
    import dataclasses

    d = dataclasses.asdict(sp)
    d["stop_token_ids"] = list(d.get("stop_token_ids") or ())
    return d


def _sp_from_dict(d: dict):
    from nanovllm_tpu.sampling_params import SamplingParams

    d = dict(d)
    d["stop_token_ids"] = tuple(d.get("stop_token_ids") or ())
    return SamplingParams(**d)
