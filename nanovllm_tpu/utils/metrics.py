"""Structured per-step metrics and logging.

Replaces the reference's scattered fmt.Printf status lines and its single
signed-token throughput counter (llm_engine.go:86-94; SURVEY.md §5
'Metrics/logging: no structured logging, no metrics endpoint') with a real
registry: counters/gauges/histograms, per-step engine records (batch
composition, cache hit rate, preemptions), and JSONL export.
"""

from __future__ import annotations

import json
import logging
import time
from collections import defaultdict
from dataclasses import dataclass, field

logger = logging.getLogger("nanovllm_tpu")


@dataclass
class Histogram:
    buckets: list[float]
    counts: list[int] = field(default_factory=list)
    total: float = 0.0
    n: int = 0

    def __post_init__(self):
        if not self.counts:
            self.counts = [0] * (len(self.buckets) + 1)

    def observe(self, v: float) -> None:
        self.total += v
        self.n += 1
        for i, b in enumerate(self.buckets):
            if v <= b:
                self.counts[i] += 1
                return
        self.counts[-1] += 1

    @property
    def mean(self) -> float:
        return self.total / self.n if self.n else 0.0

    def quantile(self, q: float) -> float:
        """Approximate quantile from bucket boundaries."""
        if not self.n:
            return 0.0
        target = q * self.n
        acc = 0
        for i, c in enumerate(self.counts[:-1]):
            acc += c
            if acc >= target:
                return self.buckets[i]
        return self.buckets[-1]


class MetricsRegistry:
    def __init__(self):
        self.counters: dict[str, float] = defaultdict(float)
        self.gauges: dict[str, float] = {}
        self.histograms: dict[str, Histogram] = {}

    def inc(self, name: str, v: float = 1.0) -> None:
        self.counters[name] += v

    def set(self, name: str, v: float) -> None:
        self.gauges[name] = v

    def observe(self, name: str, v: float, buckets=None) -> None:
        if name not in self.histograms:
            self.histograms[name] = Histogram(
                buckets or [0.001, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1, 2.5, 5, 10]
            )
        self.histograms[name].observe(v)

    def snapshot(self) -> dict:
        out: dict = dict(self.counters)
        out.update(self.gauges)
        for k, h in self.histograms.items():
            out[f"{k}_mean"] = h.mean
            out[f"{k}_p50"] = h.quantile(0.5)
            out[f"{k}_p99"] = h.quantile(0.99)
            out[f"{k}_count"] = h.n
        return out


class StepLogger:
    """Per-engine-step JSONL records: what ran, batch composition, cache
    hits, preemptions, timing."""

    def __init__(self, path: str | None = None, every: int = 1):
        self.path = path
        self.every = every
        self._fh = open(path, "a") if path else None
        self._n = 0

    def log_step(self, **fields) -> None:
        self._n += 1
        if self._n % self.every:
            return
        rec = {"ts": time.time(), "step": self._n, **fields}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        else:
            logger.debug("step %s", rec)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
