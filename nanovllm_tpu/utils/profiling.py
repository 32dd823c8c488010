"""Profiler integration (SURVEY.md §5: the reference has only coarse tok/s
telemetry; the TPU build gets real traces)."""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/nanovllm_trace"):
    """Capture a jax.profiler trace (XProf/Perfetto-compatible) around a
    block of engine work:

        with profiling.trace("/tmp/trace"):
            llm.generate(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation for host-side phases (shows up in the trace)."""
    return jax.profiler.TraceAnnotation(name)
