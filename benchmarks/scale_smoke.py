"""Scale smoke test (BASELINE config 4 shape): vote + consensus over a
100 Mb position axis, synthetic events (no SAM parsing — this stresses
the count-tensor path, memory layout, and int32 position handling).

Usage: python benchmarks/scale_smoke.py [--positions 100000000]
           [--events 50000000] [--backend host|sharded]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--positions", type=int, default=100_000_000)
    ap.add_argument("--events", type=int, default=50_000_000)
    ap.add_argument("--backend", default="host", choices=("host", "sharded"))
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU platform (8 virtual devices) before jax init",
    )
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")

    from polypolish_tpu.ops.consensus import (
        compute_thresholds,
        consensus_dense_numpy,
    )
    from polypolish_tpu.ops.vote import (
        dense_counts_host,
        depth_host,
        sparse_counts_host,
    )

    P, n = args.positions, args.events
    rng = np.random.default_rng(0)
    print(f"generating {n:,} events over {P:,} positions...", file=sys.stderr)
    pos = rng.integers(0, P, size=n).astype(np.int32)
    vocab = rng.integers(0, 8, size=n).astype(np.int32)
    weight = rng.choice([1.0, 0.5], size=n)
    orig_id = rng.integers(1, 5, size=P).astype(np.int32)

    t0 = time.time()
    depth = depth_host(pos, weight, P)
    t1 = time.time()
    valid_thr, invalid_thr, low_depth = compute_thresholds(depth, 5, 0.5, 0.2)
    t2 = time.time()

    if args.backend == "sharded":
        from polypolish_tpu.parallel import make_mesh, sharded_vote_consensus

        mesh = make_mesh()
        counts, new_id, status = sharded_vote_consensus(
            mesh, pos.astype(np.int64), vocab, P,
            valid_thr, invalid_thr, low_depth, orig_id,
        )
        t3 = t4 = time.time()
    else:
        counts = dense_counts_host(pos, vocab, P)
        t3 = time.time()
        new_id, status = consensus_dense_numpy(
            counts, valid_thr, invalid_thr, low_depth, orig_id
        )
        t4 = time.time()

    total = counts.sum(dtype=np.int64)
    assert total == n, (total, n)
    print(
        f"depth {t1 - t0:.1f}s | thresholds {t2 - t1:.1f}s | "
        f"counts {t3 - t2:.1f}s | consensus {t4 - t3:.1f}s | "
        f"changed={int((status == 1).sum()):,}",
        file=sys.stderr,
    )
    print(f"OK: {n / (t4 - t0) / 1e6:.1f} M votes/s end-to-end (host arrays)")


if __name__ == "__main__":
    main()
