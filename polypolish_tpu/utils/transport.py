"""Host<->device transport measurement + backend cost model.

The device path (``--backend pallas``) ships ~1-2 bytes per vote event
to the chip; whether that is free or fatal depends entirely on the
host<->device link.  A locally attached TPU (PCIe, >= 8 GB/s) moves a
config-2 workload's lane packs in tens of milliseconds; a remotely
tunnelled chip (~0.1-1.5 GB/s + 25-500 ms per-dispatch latency) needs
seconds — longer than the ENTIRE host-backend pipeline (BENCH_NOTES.md).

Round 3 used a single bandwidth threshold (1 GB/s), which sat inside
the tunnel's measured band for large uploads (1.1-1.5 GB/s) and did the
right thing only because the probe was latency-bound.  Round 4 replaces
it with an explicit cost model (main.rs:112-126 dispatch analog):

    host_s   = sam_bytes / HOST_ENGINE_BYTES_PER_S
    device_s = sam_bytes / (PARSE_SPEEDUP * host_rate)  (parse+pack)
             + sam_bytes * UPLOAD_FRACTION / bw     (lane slab uploads)
             + N_DISPATCH * latency                 (round trips)

and ``--backend auto`` picks the device path iff device_s < host_s.
The SAM byte count is known before the backend choice; bandwidth and
latency are measured once per process (two device_put probes).  The
host/parse rates are calibration constants from the bench suite
(overridable via POLYPOLISH_TPU_HOST_RATE), chosen conservative for the
device side so auto never regresses a working host setup.

Calibration caveat (measured round 4): on a WARM host the engine
sustains ~1.3 GB/s (page-cached inputs, pooled buffers), i.e. ~2x the
default constant, and the device path's host half (parse + lane pack)
costs nearly as much as the whole host engine — so on CPU-rich hosts
the host engine wins e2e at any link speed, and the model's pallas
picks on fast links are optimistic for one-shot runs.  Operators on
PCIe hosts with weak CPUs (where the fold dominates) should set
POLYPOLISH_TPU_HOST_RATE to their measured rate; the tunnel-side
conclusion (host) is robust either way.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

# Calibration constants (see BENCH_NOTES.md measurements):
# - host engine sustains ~600-1200 MB of SAM per second end-to-end on
#   the 2-vCPU reference host (config 2: 760 MB best 0.65-1.3 s);
# - the device path's host half (parse + lane pack, no fold) runs
#   ~2x the full host engine;
# - lane uploads move ~0.7 B per SAM byte (slots = pad x events,
#   cap layout ~1.35x, events ~0.5 x SAM bytes);
# - a polish run issues ~8 blocking dispatch round trips (slab
#   uploads overlap, but compile-cache checks, thresholds and the
#   decision fetch each pay the link latency).
HOST_ENGINE_BYTES_PER_S = 600e6
# the device path's host half (parse + lane pack, no fold) runs about
# this multiple of the full host engine; scales with any
# POLYPOLISH_TPU_HOST_RATE override
PARSE_SPEEDUP = 2.0
UPLOAD_FRACTION = 0.7
N_DISPATCH = 8
KERNEL_EPS_S = 0.05  # vote+consensus compute at chip speed

# Back-compat single threshold for transport_grade() (callers that only
# want a coarse link class); the cost model below is what auto uses.
FAST_TRANSPORT_BYTES_PER_S = 1e9

_SNIFF_BYTES = 4 << 20
_LAT_BYTES = 4 << 10

_cached_grade: Optional[str] = None
_cached_link: Optional[Tuple[float, float]] = None


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


def measure_link(refresh: bool = False) -> Tuple[float, float]:
    """(bandwidth bytes/s, latency s), measured once per process.

    Latency = best wall time of a tiny (4 KB) device_put round trip;
    bandwidth = bytes / (large-probe time - latency).
    """
    global _cached_link
    if _cached_link is not None and not refresh:
        return _cached_link
    import jax
    import numpy as np

    device = jax.devices()[0]
    lat = float("inf")
    tiny = np.zeros(_LAT_BYTES, dtype=np.uint8)
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_put(tiny, device).block_until_ready()
        lat = min(lat, time.perf_counter() - t0)
    big = np.zeros(_SNIFF_BYTES, dtype=np.uint8)
    t_big = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.device_put(big, device).block_until_ready()
        t_big = min(t_big, time.perf_counter() - t0)
    # Jitter guard: on a noisy link the best tiny-probe time can exceed
    # the best large-probe time, making (t_big - lat) ~ 0 and the
    # inferred bandwidth absurd (~4e15 B/s), which would flip auto to
    # the device path on a tunnel-grade link.  Clamp the payload time to
    # at least half the large-probe wall time.
    bw = _SNIFF_BYTES / max(t_big - lat, t_big * 0.5, 1e-9)
    _cached_link = (bw, lat)
    return _cached_link


def predict_backend(sam_bytes: int, refresh: bool = False):
    """('host' | 'pallas', details dict) from the cost model.

    Honors POLYPOLISH_TPU_TRANSPORT=fast|slow (operators who know their
    topology; also the test hook): fast models a PCIe link, slow a
    tunnel.  Returns 'host' with reason when no accelerator is attached
    or measurement fails.
    """
    host_rate = HOST_ENGINE_BYTES_PER_S
    try:
        host_rate = float(os.environ.get("POLYPOLISH_TPU_HOST_RATE",
                                         host_rate))
    except ValueError:
        pass
    override = os.environ.get("POLYPOLISH_TPU_TRANSPORT")
    if override == "fast":
        bw, lat = 8e9, 5e-5
    elif override == "slow":
        bw, lat = 1.2e9, 0.25
    else:
        try:
            import jax

            if jax.devices()[0].platform not in ("tpu", "axon"):
                return "host", {"reason": "no accelerator"}
            bw, lat = measure_link(refresh=refresh)
        except Exception as e:
            return "host", {"reason": f"link probe failed: {e!r}"}
    host_s = sam_bytes / host_rate
    device_s = (sam_bytes / (PARSE_SPEEDUP * host_rate)
                + sam_bytes * UPLOAD_FRACTION / bw
                + N_DISPATCH * lat
                + KERNEL_EPS_S)
    details = {
        "sam_bytes": int(sam_bytes),
        "bandwidth_bytes_per_s": bw,
        "latency_s": lat,
        "predicted_host_s": round(host_s, 3),
        "predicted_device_s": round(device_s, 3),
    }
    return ("pallas" if device_s < host_s else "host"), details


def transport_grade(refresh: bool = False) -> str:
    """'fast' | 'slow' | 'none' (no accelerator), cached per process.

    Coarse link class kept for callers that don't know their workload
    size; ``--backend auto`` uses predict_backend instead.  Override
    with POLYPOLISH_TPU_TRANSPORT=fast|slow.
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
