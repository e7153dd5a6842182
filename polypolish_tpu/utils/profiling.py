"""Tracing / profiling (aux subsystem; the reference only has wall-clock
timing at polish.rs:28/88 — SURVEY.md §5).

- ``phase(name)``: lightweight per-phase wall timers, reported to
  stderr when POLYPOLISH_TPU_TIMINGS=1.
- ``maybe_trace()``: wraps a block in a jax.profiler trace when
  POLYPOLISH_TPU_PROFILE=<dir> is set (view with TensorBoard/XProf).
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from typing import Dict, Iterator

_TIMINGS: Dict[str, float] = {}
_ENABLED = bool(os.environ.get("POLYPOLISH_TPU_TIMINGS"))


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    t0 = time.monotonic()
    try:
        yield
    finally:
        dt = time.monotonic() - t0
        _TIMINGS[name] = _TIMINGS.get(name, 0.0) + dt
        if _ENABLED:
            print(f"[timing] {name}: {dt:.3f}s", file=sys.stderr)


def timings() -> Dict[str, float]:
    return dict(_TIMINGS)


def reset_timings() -> None:
    _TIMINGS.clear()


@contextlib.contextmanager
def maybe_trace() -> Iterator[None]:
    trace_dir = os.environ.get("POLYPOLISH_TPU_PROFILE")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
    print(f"[profile] jax trace written to {trace_dir}", file=sys.stderr)
