"""Multi-host initialisation (DCN across hosts, ICI within a slice).

The SPMD step in parallel/shard.py is host-count agnostic: once
`jax.distributed.initialize()` has run, `jax.devices()` spans the whole
slice and the same ('data', 'pos') mesh + psum code covers multi-host
execution with no further changes (the psum rides ICI within a slice
and DCN across hosts).

On single-host setups this module is a no-op.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialise jax.distributed when running multi-host.

    Arguments default to the standard JAX environment variables
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or
    the TPU pod runtime's automatic detection.  Returns True if
    distributed mode was initialised.
    """
    import jax

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    if coordinator_address is None and num_processes is None:
        # Single-host, or a TPU pod runtime that auto-detects: attempt
        # auto-initialisation only when the pod runtime advertises
        # multiple workers, and degrade to single-host on failure.
        hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if "," in hostnames:
            try:
                jax.distributed.initialize()
                return True
            except Exception:
                return False
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(n_pos: Optional[int] = None):
    """('data', 'pos') mesh over every device in the (possibly
    multi-host) job."""
    from polypolish_tpu.parallel.mesh import make_mesh

    return make_mesh(n_pos=n_pos)
