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
        must enqueue (in order)."""
        is_src = jax.process_index() == 0
        tail = self.entries[self._synced :] if is_src else None
        tail = broadcast_payload(tail, is_src)
        if not is_src:
            self.entries.extend(tail)
        self._synced = len(self.entries)
        return tail
