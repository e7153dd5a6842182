"""Host<->device transport sniffing for backend auto-selection.

The device path (``--backend pallas``) ships ~2 bytes per vote event to
the chip; whether that is free or fatal depends entirely on the
host<->device link.  A locally attached TPU (PCIe, >= 8 GB/s) moves a
config-2 workload's chunks in tens of milliseconds; a remotely tunnelled
chip (~100 MB/s HTTP transport) needs several seconds — longer than the
ENTIRE host-backend pipeline (BENCH_NOTES.md).  ``--backend auto``
therefore measures the link once and only picks the device path when the
transport is interconnect-grade.

The sniff is one ~4 MB ``device_put`` round (warm-up + timed rep), ~10 ms
on PCIe and ~100 ms on a tunnel — negligible against either pipeline.
"""

from __future__ import annotations

import os
import time
from typing import Optional

# Below this measured host->device bandwidth the link is considered
# tunnel-grade and the device backend would be transfer-bound.  PCIe 3.0
# x8 measures >= 6 GB/s; the axon HTTP tunnel measures ~0.1 GB/s.
FAST_TRANSPORT_BYTES_PER_S = 1e9

_SNIFF_BYTES = 4 << 20

_cached_grade: Optional[str] = None


def measure_device_bandwidth(size_bytes: int = _SNIFF_BYTES,
                             device=None) -> float:
    """Measured host->device bandwidth in bytes/s (best of 2 reps)."""
    import jax
    import numpy as np

    if device is None:
        device = jax.devices()[0]
    buf = np.zeros(size_bytes, dtype=np.uint8)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.device_put(buf, device).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return size_bytes / max(best, 1e-9)


def transport_grade(refresh: bool = False) -> str:
    """'fast' | 'slow' | 'none' (no accelerator), cached per process.

    Override with POLYPOLISH_TPU_TRANSPORT=fast|slow (used by tests and
    by operators who know their topology).
    """
    global _cached_grade
    override = os.environ.get("POLYPOLISH_TPU_TRANSPORT")
    if override in ("fast", "slow"):
        return override
    if _cached_grade is not None and not refresh:
        return _cached_grade
    try:
        import jax

        dev = jax.devices()[0]
        if dev.platform not in ("tpu", "axon"):
            _cached_grade = "none"
            return _cached_grade
        bw = measure_device_bandwidth(device=dev)
        _cached_grade = "fast" if bw >= FAST_TRANSPORT_BYTES_PER_S else "slow"
    except Exception:
        _cached_grade = "none"
    return _cached_grade
