"""Device mesh construction (the reference has no parallelism at all —
SURVEY.md §2 "Parallelism & distributed-communication components").

The polishing workload has two natural parallel axes:

- ``data``: alignment-event batches (SAM shards / multiple files /
  multiple genomes) — vote counts from different batches are merged
  with an exact integer ``psum`` over this axis.
- ``pos``:  the assembly position axis — the (8, P) count tensor and
  the consensus pass shard trivially because votes are position-local.

Axes ride ICI within a slice; `jax.distributed.initialize` extends the
same mesh across hosts (DCN) with no code changes here.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh


def mesh_shape_for(
    n_devices: int, prefer_pos: Optional[int] = None
) -> Tuple[int, int]:
    """Pick a (data, pos) factorisation of n_devices.

    Position sharding is preferred once there are >= 4 devices (it cuts
    both HBM footprint and psum volume); pure data-parallel below that.
    """
    if prefer_pos is not None:
        if n_devices % prefer_pos != 0:
            raise ValueError(
                f"prefer_pos={prefer_pos} does not divide n_devices={n_devices}"
            )
        return n_devices // prefer_pos, prefer_pos
    if n_devices >= 4 and n_devices % 2 == 0:
        return 2, n_devices // 2
    return n_devices, 1


def make_mesh(
    n_data: Optional[int] = None,
    n_pos: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a 2D ('data', 'pos') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_data is None or n_pos is None:
        n_data, n_pos = mesh_shape_for(n, prefer_pos=n_pos)
    if n_data * n_pos != n:
        raise ValueError(f"mesh {n_data}x{n_pos} != {n} devices")
    import numpy as np

    dev_array = np.asarray(devices).reshape(n_data, n_pos)
    return Mesh(dev_array, ("data", "pos"))
