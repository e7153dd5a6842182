"""Benchmark harness: pileup-vote throughput on the attached accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: pileup vote accumulation throughput (the reference's
hot loop, pileup.rs:56-65) in millions of vote events per second — one
event == one voted base, so M events/s ~= Mbp/s of pileup voting.

Baseline: the reference repo publishes no numbers (BASELINE.md) and the
Rust toolchain is not present in this image, so the baseline constant
below is a documented, deliberately *generous* estimate of the Rust
reference's single-core add_seq throughput: 25 M votes/s (string
slicing + integer counters + occasional HashMap updates per vote).
vs_baseline = measured / 25e6.  See BENCH_NOTES.md.

Run: python bench.py [--events N] [--positions P] [--backend pallas|xla]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def eprint(*a):
    print(*a, file=sys.stderr)


BASELINE_VOTES_PER_S = 25e6  # documented single-core Rust estimate


def bench_vote(n_events: int, num_positions: int, backend: str, iters: int):
    import jax
    import jax.numpy as jnp

    from polypolish_tpu.ops.vote import dense_counts_host

    platform = jax.devices()[0].platform
    eprint(f"device: {jax.devices()[0]} (platform={platform})")

    rng = np.random.default_rng(0)
    # Coverage-realistic event stream: positions from sequential reads
    # (sorted-ish locality like real SAM streams), dense vocab ids with
    # an ACGT-heavy distribution.
    pos = np.sort(rng.integers(0, num_positions, size=n_events)).astype(np.int64)
    vocab = rng.choice(
        np.arange(8, dtype=np.int32), size=n_events,
        p=[0.02, 0.24, 0.24, 0.24, 0.235, 0.015, 0.005, 0.005],
    )

    if backend == "pallas":
        from polypolish_tpu.ops.vote_pallas import (
            _vote_pallas_jit, prepare_chunks,
        )

        t0 = time.time()
        chunk_pos, chunk_vocab, chunk_tile, n_tiles = prepare_chunks(
            pos, vocab, num_positions
        )
        t1 = time.time()
        eprint(f"host prep (bucket+pad): {t1 - t0:.2f}s "
               f"({n_events / (t1 - t0) / 1e6:.1f} M events/s)")
        d_pos = jnp.asarray(chunk_pos)
        d_vocab = jnp.asarray(chunk_vocab)
        d_tile = jnp.asarray(chunk_tile)
        jax.block_until_ready((d_pos, d_vocab, d_tile))

        interpret = platform not in ("tpu", "axon")
        run = lambda: _vote_pallas_jit(
            d_pos, d_vocab, d_tile, n_tiles=n_tiles, interpret=interpret
        )
    else:
        from polypolish_tpu.ops.vote import dense_counts_xla

        d_pos = jnp.asarray(pos, jnp.int32)
        d_vocab = jnp.asarray(vocab, jnp.int32)
        jax.block_until_ready((d_pos, d_vocab))
        run = lambda: dense_counts_xla(d_pos, d_vocab, num_positions)

    t0 = time.time()
    out = run()
    out.block_until_ready()
    t1 = time.time()
    eprint(f"first call (incl compile): {t1 - t0:.1f}s")

    t0 = time.time()
    for _ in range(iters):
        out = run()
    out.block_until_ready()
    dt = (time.time() - t0) / iters
    rate = n_events / dt
    eprint(f"kernel: {dt * 1000:.2f} ms/iter -> {rate / 1e6:.1f} M votes/s")

    # correctness spot-check vs host
    host = dense_counts_host(pos, vocab, num_positions)
    dev = np.asarray(out)[:, :num_positions]
    assert np.array_equal(host, dev), "device counts != host counts"
    eprint("correctness: device counts bit-identical to host")
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=20_000_000)
    ap.add_argument("--positions", type=int, default=2_000_000)
    ap.add_argument("--backend", default="pallas", choices=("pallas", "xla"))
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    rate = bench_vote(args.events, args.positions, args.backend, args.iters)
    result = {
        "metric": "pileup_vote_throughput",
        "value": round(rate / 1e6, 1),
        "unit": "M votes/s",
        "vs_baseline": round(rate / BASELINE_VOTES_PER_S, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
