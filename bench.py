"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

PRIMARY (default mode): end-to-end `polish` throughput in alignments/s
(the full polish.rs:26-38 scope: SAM parse -> group/QC -> CIGAR walk ->
trim -> votes -> consensus -> polished FASTA on a real workload),
measured against a MEASURED baseline: the single-threaded C++
reference replica `ppref` (native/ref_replica.cc), which mirrors the
Rust reference's per-record structure — the Rust toolchain is not
available in this image (BASELINE.md), and the replica errs on the
fast side, so vs_baseline is conservative.  Both sides run best-of-N
on the same config-2-shaped workload (E. coli-scale paired-end, two
SAM files, repeat-driven multi-mapped secondaries) and the polished
FASTA is asserted byte-identical between them on every run.

SECONDARY (--kernel): isolated Pallas vote-kernel throughput in
M votes/s (pileup.rs:56-65 analog) with --variant/--sweep/--ab knobs.

Run:  python bench.py [--genome-mb 4.6] [--coverage 50] [--runs 7]
      python bench.py --backend host|pallas|xla   # force one backend
      python bench.py --kernel [--variant unfused|fused|split] [--sweep]
"""

from __future__ import annotations

import argparse
import functools
import io
import json
import os
import subprocess
import sys
import time

import numpy as np


def eprint(*a):
    print(*a, file=sys.stderr)


CACHE_DIR = os.environ.get(
    "POLYPOLISH_TPU_BENCH_DIR", "/tmp/polypolish_tpu_bench"
)


# ---------------------------------------------------------------------
# End-to-end mode
# ---------------------------------------------------------------------

def ensure_workload(genome_mb: float, coverage: float, read_len: int,
                    repeat_len: int, repeat_copies: int, seed: int,
                    n_contigs: int = 1):
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))
    import workload

    key = (f"e2e_{genome_mb}_{coverage}_{read_len}_{repeat_len}_"
           f"{repeat_copies}_{seed}"
           + (f"_c{n_contigs}" if n_contigs > 1 else ""))
    asm = os.path.join(CACHE_DIR, f"{key}.fasta")
    paths = [os.path.join(CACHE_DIR, f"{key}_{i}.sam") for i in (1, 2)]
    if all(os.path.exists(p) for p in [asm] + paths):
        return asm, paths
    t0 = time.time()
    eprint(f"generating workload {key} ...")
    if n_contigs > 1:
        # SURVEY config-4 shape: a multi-contig draft
        fasta, sams, info = workload.make_multi_contig_case(
            seed=seed, n_contigs=n_contigs,
            contig_len=int(genome_mb * 1e6) // n_contigs,
            coverage=coverage, read_len=read_len,
            repeat_len=repeat_len, repeat_copies=repeat_copies,
        )
    else:
        fasta, sams, info = workload.make_paired_case(
            seed=seed, genome_len=int(genome_mb * 1e6), coverage=coverage,
            read_len=read_len, repeat_len=repeat_len,
            repeat_copies=repeat_copies,
        )
    os.makedirs(CACHE_DIR, exist_ok=True)
    with open(asm, "w") as f:
        f.write(fasta)
    for p, s in zip(paths, sams):
        with open(p, "w") as f:
            f.write(s)
    eprint(f"  {info['n_alignments']:,} alignments "
           f"({info['n_secondary']:,} secondary), "
           f"{sum(os.path.getsize(p) for p in paths)/1e6:.0f} MB SAM, "
           f"generated in {time.time()-t0:.1f}s")
    return asm, paths


def run_replica(asm, sams, runs: int):
    """Best-of-N ppref wall times; returns (best_s, all_s, fasta_bytes)."""
    from polypolish_tpu.native import replica

    times = []
    fasta = None
    for r in range(runs):
        t0 = time.time()
        proc = replica.run_polish(asm, sams)
        dt = time.time() - t0
        assert proc.returncode == 0, proc.stderr.decode()[-500:]
        times.append(dt)
        fasta = proc.stdout
        timing = replica.parse_timing(proc.stderr)
        eprint(f"  replica run {r}: wall {dt:.2f}s "
               f"(self-timed {timing.get('total_s', 0):.2f}s: "
               f"load {timing.get('load_s', 0):.2f} "
               f"align {timing.get('align_s', 0):.2f} "
               f"polish {timing.get('polish_s', 0):.2f})")
    return min(times), times, fasta


def run_framework(asm, sams, backend: str, runs: int, ref_fasta: bytes):
    """Best-of-N in-process polish() wall times (first run pays any jit
    compile; later runs are warm — matching a long-lived service)."""
    from polypolish_tpu import log
    from polypolish_tpu.pipeline.polish import polish
    from polypolish_tpu.utils.profiling import reset_timings, timings

    os.environ.setdefault("POLYPOLISH_TPU_TIMINGS", "0")
    times = []
    for r in range(runs):
        reset_timings()
        out = io.StringIO()
        t0 = time.time()
        with log.quiet():
            polish(None, 0.2, 0.5, 10, 5, False, asm, list(sams),
                   out=out, backend=backend)
        dt = time.time() - t0
        times.append(dt)
        phases = {k: round(v, 2) for k, v in timings().items()}
        eprint(f"  {backend} run {r}: wall {dt:.2f}s {phases}")
        if out.getvalue().encode() != ref_fasta:
            eprint(f"FATAL: {backend} FASTA differs from replica output")
            raise SystemExit(1)
    return min(times), times


def main_e2e(args):
    from polypolish_tpu.native import loader, replica
    from polypolish_tpu.utils.compile_cache import enable_persistent_cache
    from polypolish_tpu.utils.malloc_tuning import tune_malloc

    enable_persistent_cache()
    tune_malloc()
    if replica.build() is None:
        eprint("FATAL: cannot build the ppref baseline replica")
        raise SystemExit(1)
    if not loader.available():
        eprint("WARNING: native library unavailable; framework falls back "
               "to pure Python (not the production configuration)")

    asm, sams = ensure_workload(
        args.genome_mb, args.coverage, args.read_len,
        args.repeat_len, args.repeat_copies, args.seed,
        n_contigs=getattr(args, "contigs", 1),
    )
    n_alignments = None
    # count aligned records once from the replica's stderr
    import subprocess  # noqa: F401

    eprint(f"baseline: ppref (single-core reference replica), "
           f"best of {args.baseline_runs} (first pass; interleaved "
           f"re-runs follow the framework runs)")
    base_s, base_all, ref_fasta = run_replica(asm, sams, args.baseline_runs)

    proc = replica.run_polish(asm, sams)
    n_alignments = 0
    for line in proc.stderr.decode().splitlines():
        if " alignments from " in line:
            n_alignments += int(
                line.split(": ")[1].split(" alignments")[0].replace(",", "")
            )
    eprint(f"workload: {n_alignments:,} aligned records; baseline best "
           f"{base_s:.2f}s = {n_alignments/base_s/1e3:.0f}k alignments/s")

    # Default e2e benches the host engine only: on this environment the
    # TPU is tunnel-attached (~100 MB/s transport), so the device
    # backend's mandatory ~250 MB event upload alone exceeds the whole
    # host pipeline (~0.6 s) — see BENCH_NOTES.md "device path" for the
    # measured physics and why pallas remains the right default on
    # PCIe/local-attached TPU hosts.  Bench it explicitly with
    # --backend pallas.
    backends = [args.backend] if args.backend else ["host"]
    results = {}
    for backend in backends:
        if backend != "host":
            try:
                import jax

                if jax.devices()[0].platform not in ("tpu", "axon"):
                    eprint(f"  ({backend}: no TPU attached — interpret "
                           f"mode would be meaningless; skipping)")
                    continue
            except Exception:
                continue
        eprint(f"framework backend={backend}, best of {args.runs}")
        try:
            best, _all = run_framework(asm, sams, backend, args.runs,
                                       ref_fasta)
            results[backend] = best
        except SystemExit:
            raise
        except Exception as e:  # record but keep benching other backends
            eprint(f"  {backend} FAILED: {e!r}")
    if not results:
        eprint("FATAL: no framework backend produced a result")
        raise SystemExit(1)

    # second baseline pass AFTER the framework runs: machine state
    # drifts on this microVM (page cache, fault service), so sampling
    # the replica at both ends of the session and taking its best keeps
    # the best-vs-best ratio from flattering whichever side happened to
    # run in the better window
    eprint(f"baseline re-check: ppref, best of {args.baseline_runs}")
    base_s2, _a, ref2 = run_replica(asm, sams, args.baseline_runs)
    if ref2 != ref_fasta:
        eprint("FATAL: replica output changed between passes")
        raise SystemExit(1)
    base_s = min(base_s, base_s2)

    best_backend = min(results, key=results.get)
    ours_s = results[best_backend]
    ours_rate = n_alignments / ours_s
    base_rate = n_alignments / base_s
    eprint(f"best backend: {best_backend} {ours_s:.2f}s = "
           f"{ours_rate/1e3:.0f}k alignments/s "
           f"(vs baseline {base_rate/1e3:.0f}k) — output byte-identical")
    counted = measure_counted_metrics(asm, sams, ref_fasta)
    tpu_extras = measure_chip_extras(args, asm, sams, ref_fasta)
    print(json.dumps({
        "metric": "polish_e2e_alignments_per_s",
        "value": round(ours_rate / 1e3, 1),
        "unit": "k alignments/s",
        "vs_baseline": round(ours_rate / base_rate, 2),
        **({"counted": counted} if counted else {}),
        **tpu_extras,
    }))


def measure_counted_metrics(asm, sams, ref_fasta):
    """Noise-independent per-phase COUNTED metrics (VERDICT r4 item 9):
    one extra host run with the native rdtsc phase counters enabled,
    reported as cycles/bytes/events — stable through the microVM's
    2-5x wall-clock weather, so regressions are visible independently
    of whichever window a session happened to measure in."""
    try:
        from polypolish_tpu.native import binding

        if binding.load_library() is None:
            return {}
        ghz = binding.tsc_hz() / 1e9
        binding.prof_enable(True)
        binding.prof_read(reset=True)
        run_framework(asm, sams, "host", 1, ref_fasta)
        p = binding.prof_read(reset=True)
        binding.prof_enable(False)
        rng = p["parse_range_cycles"]
        out = {
            "tsc_ghz": round(ghz, 3),
            "sam_bytes": p["sam_bytes"],
            "parse_cycles_g": round(rng / 1e9, 3),
            "parse_bytes_per_cycle": round(p["sam_bytes"] / max(rng, 1), 3),
            "tokenize_pct": round(100 * p["tokenize_cycles"] / max(rng, 1), 1),
            "fill_pct": round(100 * p["fill_cycles"] / max(rng, 1), 1),
            "dispatch_pct": round(100 * p["dispatch_cycles"] / max(rng, 1), 1),
            "reuse_hits": p["reuse_hits"],
            "walked_alignments": p["walked_alignments"],
            "fold_cycles_g": round(p["fold_cycles"] / 1e9, 3),
            "fold_events_m": round(p["fold_events"] / 1e6, 1),
            "fold_cycles_per_event": round(
                p["fold_cycles"] / max(p["fold_events"], 1), 2),
        }
        eprint(f"counted metrics: {json.dumps(out)}")
        return out
    except Exception as e:
        eprint(f"  counted metrics skipped: {e!r}")
        return {}


def measure_chip_extras(args, asm, sams, ref_fasta):
    """When a TPU is attached, append chip evidence to the default bench
    run (round-3 verdict item 2: the driver-captured artifact was
    host-only): the lanes-kernel roofline (G votes/s, %HBM, %VPU, pad
    factor; bitwise-checked) on a depth-50 shape, plus a warm device-e2e
    wall time for the full pallas-backend polish.  Never fails the host
    metric — any chip error is reported to stderr and skipped.  Disable
    with POLYPOLISH_TPU_BENCH_CHIP=0 / --no-chip."""
    if getattr(args, "no_chip", False):
        return {}
    if os.environ.get("POLYPOLISH_TPU_BENCH_CHIP", "1") == "0":
        return {}
    extras = {}
    try:
        import jax

        if jax.devices()[0].platform not in ("tpu", "axon"):
            return {}
    except Exception:
        return {}
    # Compiled-kernel pytest gate (VERDICT r4 item 2): run the @tpu
    # chip tests (interpret=False, bitwise vs host fold) BEFORE any
    # kernel capture, so a Mosaic lowering regression fails the bench
    # session as a test failure instead of shipping a wrong number.
    try:
        eprint("TPU attached: compiled-kernel pytest gate (-m tpu) ...")
        env = dict(os.environ, POLYPOLISH_TPU_CHIP_TESTS="1")
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/test_tpu_chip.py",
             "-m", "tpu", "-q", "--no-header"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            env=env, capture_output=True, text=True, timeout=3600,
        )
        tail = "\n".join(proc.stdout.strip().splitlines()[-2:])
        eprint(f"  chip gate: {tail}")
        extras["tpu_kernel_gate"] = (
            "passed" if proc.returncode == 0 else "FAILED"
        )
        if proc.returncode != 0:
            eprint(proc.stdout[-2000:])
            eprint("  compiled-kernel chip gate FAILED; kernel capture "
                   "aborted (host metric still reported)")
            return extras
    except Exception as e:
        eprint(f"  chip gate skipped: {e!r}")
    try:
        from polypolish_tpu.ops import vote_lanes

        eprint("TPU attached: lanes-kernel roofline (depth-50 shape, "
               "cap layout + MXU overflow — the round-5 best config — "
               "bitwise-checked) ...")
        n_pos = 500_000  # half the config-2 shape: same depth profile,
        #                  half the host prep time; measured rate matches
        #                  the 1M-position shape within noise
        rng = np.random.default_rng(0)
        pos = np.sort(
            rng.integers(0, n_pos, size=50 * n_pos)
        ).astype(np.int64)
        vocab = rng.choice(
            np.arange(8, dtype=np.int32), size=pos.size,
            p=[0.02, 0.24, 0.24, 0.24, 0.235, 0.015, 0.005, 0.005],
        )
        rate, roofline = bench_lanes(
            pos, vocab, n_pos, 24, None, vote_lanes.TILE_W, check=True,
            cap=True, ov_mode="mxu",
        )
        extras["tpu_kernel"] = {
            "g_votes_per_s": round(rate / 1e9, 1),
            "g_slots_per_s": round(roofline["slots_per_s"] / 1e9, 1),
            "pad_factor": roofline["pad_factor"],
            "overflow_frac": roofline["overflow_frac"],
            "pct_hbm_peak": roofline["pct_hbm_peak"],
            "pct_vpu_peak": roofline["pct_vpu_peak"],
        }
        eprint(json.dumps({
            "metric": "lanes_kernel_votes_per_s",
            "value": round(rate / 1e9, 2),
            "unit": "G votes/s",
            **extras["tpu_kernel"],
        }))
    except Exception as e:
        eprint(f"  kernel roofline skipped: {e!r}")
    try:
        eprint("framework backend=pallas (warm device e2e), best of 2")
        best_dev, _ = run_framework(asm, sams, "pallas", 2, ref_fasta)
        extras["tpu_device_e2e_s"] = round(best_dev, 2)
    except Exception as e:
        eprint(f"  device e2e skipped: {e!r}")
    return extras


# ---------------------------------------------------------------------
# Kernel mode (secondary metric; the round-1 harness, kept intact)
# ---------------------------------------------------------------------

KERNEL_BASELINE_VOTES_PER_S = 25e6  # documented single-core estimate


def _make_events(n_events: int, num_positions: int):
    rng = np.random.default_rng(0)
    pos = np.sort(rng.integers(0, num_positions, size=n_events)).astype(np.int64)
    vocab = rng.choice(
        np.arange(8, dtype=np.int32), size=n_events,
        p=[0.02, 0.24, 0.24, 0.24, 0.235, 0.015, 0.005, 0.005],
    )
    return pos, vocab


def time_chained(kernel_once, args, dep_index: int, iters: int):
    """Honest device timing: iterations are chained through a runtime
    zero derived from the previous output, so the compiler cannot hoist
    or dedupe them, and one final fetch covers all device work."""
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
                 verbose=True, variant="fused"):
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
            tile_p=tile_p, e_sub=e_sub, fused=variant,
        )

    dt, compile_s = time_chained(kernel_once, d_args, 2, iters)
    rate = n_events / dt
    if verbose:
        eprint(
            f"pallas {variant} tile_p={tile_p} e_sub={e_sub}: prep {prep_s:.2f}s "
            f"(pad {pad_frac:.0%}), compile {compile_s:.1f}s, "
            f"kernel {dt * 1000:.2f} ms -> {rate / 1e6:.0f} M votes/s"
        )
    return rate, kernel_once, d_args


# v5e single-chip peaks for the roofline fields (public spec numbers:
# 819 GB/s HBM; VPU = 8x128 lanes x 4 ALUs at ~940 MHz)
HBM_PEAK_BYTES_PER_S = 819e9
VPU_PEAK_LANE_OPS_PER_S = 8 * 128 * 4 * 0.94e9
# VPU lane-ops per slot by kernel body — crude cost-model estimates
# used only for the %VPU-peak roofline field (packed4 skips the int8
# widen entirely; byte extraction is in-register)
LANES_LANE_OPS_PER_SLOT_BY_BODY = {"packed4": 12, "packed": 16, "cmp": 24}
LANES_LANE_OPS_PER_SLOT = 16  # legacy default


def _auto_r_sub(pos, num_positions, tile_w, cap=False):
    """Pick the packed4 row-block size from the depth profile: minimise
    estimated kernel time = slots (compute, ~constant G slots/s) +
    blocks * step-overhead (~60k slot-equivalents per step, measured).
    With cap=True the candidate row counts come from the
    depth-stratified policy (ops.vote_lanes.choose_rows_per_tile)."""
    from polypolish_tpu.ops.vote_lanes import choose_rows_per_tile

    depth = np.bincount(pos, minlength=num_positions)
    n_tiles = max(1, -(-num_positions // tile_w))
    pad = np.zeros(n_tiles * tile_w, dtype=np.int64)
    pad[:depth.shape[0]] = depth
    best = (None, None)
    for c in (32, 64, 96, 128, 160, 192):
        rows = choose_rows_per_tile(pad, n_tiles, tile_w, c, cap=cap)
        cost = int(rows.sum()) * tile_w \
            + int((rows // c).sum()) * 60_000
        if best[0] is None or cost < best[0]:
            best = (cost, c)
    return best[1]


def bench_lanes(pos, vocab, num_positions, iters, r_sub, tile_w,
                verbose=True, check=True, body="packed4", cap=False,
                ov_mode="scatter"):
    """Lane-aligned VPU kernel (ops/vote_lanes.py) with noise-robust
    chained timing (the tunnel adds ~25-500 ms fixed per dispatch, so
    rate = best-of-reps of (T(1+iters) - T(1)) / iters) and a
    roofline/MFU accounting block in the JSON.  cap=True benches the
    depth-stratified layout — the overflow add runs INSIDE the timed
    body, so votes/s stays an honest whole-pileup rate.  ov_mode picks
    the overflow mechanism: 'scatter' (XLA scatter-add, ~8 ns/event) or
    'mxu' (VERDICT r4 item 3: the sorted-COO overflow list packed into
    the MXU chunks layout and folded by the one-hot-matmul Pallas
    kernel, added tensor-to-tensor — a Pallas-native overflow path)."""
    import jax
    import jax.numpy as jnp

    from polypolish_tpu.ops.vote_lanes import (
        _lanes_call,
        add_overflow_counts,
        prepare_lanes,
    )

    platform = jax.devices()[0].platform
    interpret = platform not in ("tpu", "axon")
    n_events = pos.shape[0]

    t0 = time.time()
    if r_sub is None:
        r_sub = _auto_r_sub(pos, num_positions, tile_w, cap=cap)
        eprint(f"auto r_sub: {r_sub}")
    packed = prepare_lanes(
        pos, vocab, num_positions, r_sub=r_sub, tile_w=tile_w, cap=cap
    )
    if cap:
        vb, block_tile, n_tiles, ov_pos, ov_vid = packed
    else:
        vb, block_tile, n_tiles = packed
        ov_pos = ov_vid = None
    prep_s = time.time() - t0
    pad = vb.size / max(n_events, 1)
    ov_frac = (ov_pos.size / max(n_events, 1)) if cap else 0.0
    if body == "packed4":
        from polypolish_tpu.ops.vote_lanes import to_packed4

        arr = to_packed4(vb, r_sub)
    elif body == "packed8":
        from polypolish_tpu.ops.vote_lanes import to_packed8

        arr = to_packed8(vb, r_sub)
    else:
        arr = vb.view(np.int8)
    d_vb = jnp.asarray(arr)
    d_bt = jnp.asarray(block_tile)
    d_op = d_ov = None
    mxu_ov = None
    if cap and ov_pos.size:
        if ov_mode == "mxu":
            from polypolish_tpu.ops.vote_pallas import (
                _vote_pallas_call,
                prepare_chunks,
            )

            P_pad = n_tiles * tile_w
            cp, cv, ct, mxu_tiles = prepare_chunks(
                ov_pos.astype(np.int64), ov_vid.astype(np.int32), P_pad,
            )
            d_cp = jnp.asarray(cp)
            d_cv = jnp.asarray(cv)
            d_ct = jnp.asarray(ct)
            jax.block_until_ready((d_cp, d_cv, d_ct))

            def mxu_ov(out):
                extra = _vote_pallas_call(
                    d_cp, d_cv, d_ct, n_tiles=mxu_tiles,
                    interpret=interpret,
                )
                return out + extra[:, :out.shape[1]]
        else:
            d_op = jnp.asarray(ov_pos)
            d_ov = jnp.asarray(ov_vid)
            jax.block_until_ready((d_op, d_ov))

    def kernel_once(bt, v):
        out = _lanes_call(v, bt, n_tiles=n_tiles, interpret=interpret,
                          r_sub=r_sub, tile_w=tile_w, body=body)
        if mxu_ov is not None:
            out = mxu_ov(out)
        elif d_op is not None:
            out = add_overflow_counts(out, d_op, d_ov)
        return out

    if check:
        from polypolish_tpu.ops.vote import dense_counts_host

        got = np.asarray(kernel_once(d_bt, d_vb))[:, :num_positions]
        want = dense_counts_host(pos, vocab, num_positions)
        assert np.array_equal(got, want), "lanes counts != host counts"

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(n, bt, v):
        def body(_, acc):
            bias = jnp.minimum(acc[0, 0], 0).astype(bt.dtype)
            out = kernel_once(bt + bias, v)
            return acc + out[:1, :1]

        return jax.lax.fori_loop(0, n, body, jnp.zeros((1, 1), jnp.int32))

    t0 = time.time()
    np.asarray(run_n(1, d_bt, d_vb))
    compile_s = time.time() - t0
    # the dispatch path adds a large FIXED latency per invocation
    # (~25-500 ms through the tunnel), so grow the chained iteration
    # count until the marginal loop time dominates that noise floor
    while True:
        np.asarray(run_n(1 + iters, d_bt, d_vb))
        t0 = time.time()
        np.asarray(run_n(1, d_bt, d_vb))
        t1 = time.time() - t0
        t0 = time.time()
        np.asarray(run_n(1 + iters, d_bt, d_vb))
        t2 = time.time() - t0
        if t2 - t1 >= 0.3 or iters >= 4096:
            break
        iters = min(iters * 4, 4096)
    best = max((t2 - t1) / iters, 1e-9)
    for _ in range(2):
        t0 = time.time()
        np.asarray(run_n(1, d_bt, d_vb))
        t1 = time.time() - t0
        t0 = time.time()
        np.asarray(run_n(1 + iters, d_bt, d_vb))
        t2 = time.time() - t0
        best = min(best, max((t2 - t1) / iters, 1e-9))

    n_blocks = vb.shape[0] // r_sub
    rate = n_events / best
    slot_rate = vb.size / best
    out_bytes = n_tiles * tile_w * 8 * 4
    ops_per_slot = LANES_LANE_OPS_PER_SLOT_BY_BODY.get(
        body, LANES_LANE_OPS_PER_SLOT
    )
    roofline = {
        "votes_per_s": rate,
        "slots_per_s": slot_rate,
        "pad_factor": round(pad, 2),
        "overflow_frac": round(ov_frac, 4),
        "bytes_per_s": slot_rate * 1 + out_bytes / best,
        "pct_hbm_peak": round(
            100 * (slot_rate + out_bytes / best) / HBM_PEAK_BYTES_PER_S, 1
        ),
        "lane_ops_per_s": slot_rate * ops_per_slot,
        "pct_vpu_peak": round(
            100 * slot_rate * ops_per_slot / VPU_PEAK_LANE_OPS_PER_S, 1
        ),
        "ns_per_grid_step": round(best / n_blocks * 1e9, 1),
    }
    if verbose:
        eprint(
            f"lanes[{body}{'+cap' if cap else ''}] tile_w={tile_w} "
            f"r_sub={r_sub}: prep {prep_s:.2f}s "
            f"(pad {pad:.2f}x, ov {100*ov_frac:.2f}%), "
            f"compile {compile_s:.1f}s, "
            f"kernel {best * 1000:.3f} ms -> {rate / 1e9:.2f} G votes/s "
            f"({slot_rate / 1e9:.1f} G slots/s, "
            f"{roofline['pct_vpu_peak']:.0f}% VPU peak, "
            f"{roofline['pct_hbm_peak']:.0f}% HBM peak"
            + (", bitwise OK)" if check else ")")
        )
    return rate, roofline


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


def main_kernel(args):
    from polypolish_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    eprint(f"device: {jax.devices()[0]}")
    pos, vocab = _make_events(args.events, args.positions)

    if args.variant == "lanes" and not (args.ab or args.sweep or args.xla):
        from polypolish_tpu.ops import vote_lanes

        r_sub = args.e_sub or None  # None -> depth-profile auto-pick
        tile_w = args.tile_p or vote_lanes.TILE_W
        rate, roofline = bench_lanes(
            pos, vocab, args.positions, max(args.iters, 24), r_sub, tile_w,
            check=not args.no_check, cap=args.cap, ov_mode=args.ov_mode,
            body=args.lanes_body,
        )
        print(json.dumps({
            "metric": "pileup_vote_throughput",
            "value": round(rate / 1e6, 1),
            "unit": "M votes/s",
            "vs_baseline": round(rate / KERNEL_BASELINE_VOTES_PER_S, 2),
            "roofline": roofline,
        }))
        return

    if args.ab:
        tile_p, e_sub = 256, 8
        rates = {}
        variants = ("unfused", "fused", "split", "lanes")
        for variant in variants * 2:
            if variant == "lanes":
                from polypolish_tpu.ops import vote_lanes

                r, _ = bench_lanes(
                    pos, vocab, args.positions, max(args.iters, 24),
                    None, vote_lanes.TILE_W, check=False,
                )
            else:
                r, _, _ = bench_pallas(
                    pos, vocab, args.positions, args.iters, tile_p, e_sub,
                    variant=variant,
                )
            rates.setdefault(variant, []).append(r)
        for variant, rs in rates.items():
            eprint(f"{variant}: " + ", ".join(f"{r/1e6:.0f}" for r in rs)
                   + " M votes/s")
        rate = max(max(rs) for rs in rates.values())
    elif args.sweep:
        best = (0.0, None)
        for tile_p in (128, 256, 512, 1024):
            for e_sub in (8, 16, 32):
                rate, _, _ = bench_pallas(
                    pos, vocab, args.positions, args.iters, tile_p, e_sub,
                    variant=args.variant,
                )
                if rate > best[0]:
                    best = (rate, (tile_p, e_sub))
        bench_xla(pos, vocab, args.positions, args.iters)
        eprint(f"best: {best[1]} at {best[0] / 1e6:.0f} M votes/s")
        rate = best[0]
    elif args.xla:
        rate, kernel_once, d_args = bench_xla(
            pos, vocab, args.positions, args.iters
        )
    else:
        from polypolish_tpu.ops import vote_pallas

        tile_p = args.tile_p or vote_pallas.TILE_P
        e_sub = args.e_sub or vote_pallas.E_SUB
        rate, kernel_once, d_args = bench_pallas(
            pos, vocab, args.positions, args.iters, tile_p, e_sub,
            variant=args.variant,
        )
        if not args.no_check:
            from polypolish_tpu.ops.vote import dense_counts_host

            host = dense_counts_host(pos, vocab, args.positions)
            dev = np.asarray(kernel_once(*d_args))[:, : args.positions]
            assert np.array_equal(host, dev), "device counts != host counts"
            eprint("correctness: device counts bit-identical to host")

    print(json.dumps({
        "metric": "pileup_vote_throughput",
        "value": round(rate / 1e6, 1),
        "unit": "M votes/s",
        "vs_baseline": round(rate / KERNEL_BASELINE_VOTES_PER_S, 2),
    }))


def main_device_profile(args):
    """Steady-state device-path e2e with a transfer/compute/compile
    phase split (round-3 deliverable): measures each stage of the
    pallas/lanes polish path on the config-2 workload and projects the
    PCIe-host e2e from the measured pieces.  Output: one JSON line with
    the phase dict; byte-identity vs the host backend asserted."""
    import jax
    import jax.numpy as jnp

    from polypolish_tpu.io.fasta import load_fasta
    from polypolish_tpu.models.polisher import LanesPolisher
    from polypolish_tpu.native import runs as native_runs
    from polypolish_tpu.pipeline.polish import _pad_bucket
    from polypolish_tpu.utils.compile_cache import enable_persistent_cache
    from polypolish_tpu.utils.malloc_tuning import tune_malloc
    from polypolish_tpu.vocab import Vocab

    enable_persistent_cache()
    tune_malloc()
    assert jax.devices()[0].platform in ("tpu", "axon"), "needs a TPU"
    asm, sams = ensure_workload(
        args.genome_mb, args.coverage, args.read_len,
        args.repeat_len, args.repeat_copies, args.seed,
    )
    phases = {}

    t0 = time.time()
    fa = load_fasta(asm)
    names = [n for n, _, _ in fa]
    lens = {n: len(s) for n, _, s in fa}
    phases["load_fasta_s"] = round(time.time() - t0, 3)

    eprint("[device-profile] parsing ...")
    t0 = time.time()
    pr = native_runs.parse_runs(sams, names, lens, Vocab(), 10, False)
    phases["parse_s"] = round(time.time() - t0, 3)
    name = max(names, key=lambda n: lens[n])
    seq_len = lens[name]
    p_pad = _pad_bucket(seq_len)

    t0 = time.time()
    _, depth, _, thr = pr.fold(
        name, want_counts=False, thresholds=(5, 0.5, 0.2)
    )
    phases["depth_thresholds_s"] = round(time.time() - t0, 3)

    model = LanesPolisher(p_pad)
    t0 = time.time()
    # the production pack: packed4 int32 layout + depth-stratified cap
    # (round 4 — ~35% fewer upload bytes; overflow scatter-added below)
    pack = pr.lanes(name, model.r_sub, model.tile_w, num_positions=p_pad,
                    packed4=(model.body == "packed4"), cap=True)
    phases["lanes_pack_s"] = round(time.time() - t0, 3)
    n_events = pack.n_events
    vb_bytes = pack.vb.size * pack.vb.itemsize
    upload_bytes = vb_bytes + pack.block_tile.size * 4 + pack.n_overflow * 5
    phases["wire_bytes_per_event"] = round(vb_bytes / n_events, 2)
    phases["overflow_events"] = int(pack.n_overflow)

    # upload (measured separately from compute)
    t0 = time.time()
    d_vb = jax.device_put(pack.vb)
    d_bt = jax.device_put(pack.block_tile)
    jax.block_until_ready((d_vb, d_bt))
    if pack.n_overflow:
        op, ov = model._pad_overflow(pack.ov_pos, pack.ov_vid)
        d_op = jax.device_put(op)
        d_ov = jax.device_put(ov)
        jax.block_until_ready((d_op, d_ov))
    else:
        d_op = d_ov = None
    phases["upload_s"] = round(time.time() - t0, 3)
    up_bw = upload_bytes / max(phases["upload_s"], 1e-9)
    phases["upload_bytes"] = int(upload_bytes)
    phases["upload_MB_s"] = round(up_bw / 1e6, 1)

    # kernel compute, chained (excludes dispatch noise floor); the
    # overflow scatter runs inside the timed body (production cost)
    rpb = model.rows_per_block
    n_blocks = pack.vb.shape[0] // rpb
    if n_blocks <= model.max_blocks:
        def vote_once(bt, v):
            return model._single_jit(v, bt)
    else:
        m = model.max_blocks

        def vote_once(bt, v):
            total = None
            for s in range(n_blocks // m):
                part = model._slab_jit(
                    jax.lax.dynamic_slice_in_dim(
                        v, s * m * rpb, m * rpb
                    ),
                    jax.lax.dynamic_slice_in_dim(bt, s * m, m),
                )
                total = part if total is None else total + part
            return total

    def kernel_once(bt, v):
        out = vote_once(bt, v)
        if d_op is not None:
            out = model._ov_add_jit(out, d_op, d_ov)
        return out

    @functools.partial(jax.jit, static_argnames=("n",))
    def run_n(n, bt, v):
        def body(_, acc):
            bias = jnp.minimum(acc[0, 0], 0).astype(bt.dtype)
            out = kernel_once(bt + bias, v)
            return acc + out[:1, :1]

        return jax.lax.fori_loop(0, n, body, jnp.zeros((1, 1), jnp.int32))

    eprint("[device-profile] compiling chained kernel ...")
    t0 = time.time()
    np.asarray(run_n(1, d_bt, d_vb))
    phases["kernel_compile_s"] = round(time.time() - t0, 3)
    eprint(f"[device-profile] kernel compiled in {phases['kernel_compile_s']}s")
    iters = 24
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(run_n(1, d_bt, d_vb))
        t1 = time.time() - t0
        t0 = time.time()
        np.asarray(run_n(1 + iters, d_bt, d_vb))
        t2 = time.time() - t0
        best = min(best, max((t2 - t1) / iters, 1e-9))
    phases["vote_compute_s"] = round(best, 4)
    phases["vote_G_votes_s"] = round(n_events / best / 1e9, 1)

    # consensus + fetch of the decision arrays
    i32max = np.int32(2**31 - 1)
    valid_thr, invalid_thr, low_depth = thr
    orig_id = np.zeros(seq_len, np.int32)

    def pad(arr, fill, dtype):
        out = np.full(p_pad, fill, dtype=dtype)
        out[:seq_len] = arr
        return jnp.asarray(out)

    thr_args = (
        pad(valid_thr, i32max, np.int32), pad(invalid_thr, i32max, np.int32),
        pad(low_depth, True, bool), pad(orig_id, 0, np.int32),
    )
    eprint("[device-profile] consensus + fetch ...")
    counts = kernel_once(d_bt, d_vb)
    jax.block_until_ready(counts)
    t0 = time.time()
    _c, new_id_j, status_j = model._finish_jit(counts, *thr_args)
    new_id = np.array(new_id_j)
    status = np.array(status_j)
    phases["consensus_fetch_s"] = round(time.time() - t0, 3)
    fetch_bytes = new_id.nbytes + status.nbytes
    phases["fetch_bytes"] = int(fetch_bytes)
    pack.close()
    pr.close()

    # cold + warm true e2e through the pipeline, byte-identity asserted
    ref_out = io.StringIO()
    from polypolish_tpu import log
    from polypolish_tpu.pipeline.polish import polish

    with log.quiet():
        polish(None, 0.2, 0.5, 10, 5, False, asm, list(sams),
               out=ref_out, backend="host")
    eprint("[device-profile] full pipeline e2e runs ...")
    for label, n_runs in (("cold", 1), ("warm", 2)):
        times = []
        for _ in range(n_runs):
            out = io.StringIO()
            t0 = time.time()
            with log.quiet():
                polish(None, 0.2, 0.5, 10, 5, False, asm, list(sams),
                       out=out, backend="pallas")
            times.append(time.time() - t0)
            eprint(f"[device-profile] e2e {label} run: {times[-1]:.2f}s")
            assert out.getvalue() == ref_out.getvalue(), \
                "pallas FASTA != host FASTA"
        phases[f"e2e_{label}_s"] = round(min(times), 2)

    # PCIe projection: replace the measured tunnel transfer times with
    # bytes / 16 GB/s (PCIe gen4 x8 conservative), keep everything else
    pcie = 16e9
    projected = (
        phases["parse_s"] + phases["depth_thresholds_s"]
        + phases["lanes_pack_s"] + upload_bytes / pcie
        + phases["vote_compute_s"] + fetch_bytes / pcie + 0.2
    )
    phases["e2e_pcie_projected_s"] = round(projected, 2)
    eprint(json.dumps(phases, indent=2))
    print(json.dumps({
        "metric": "device_e2e_phase_split",
        "value": phases["e2e_warm_s"],
        "unit": "s",
        "vs_baseline": 0,
        "phases": phases,
    }))



def main_config5(args):
    """Config-5 (BASELINE.md): a batch of small genomes polished
    data-parallel through `pipeline/batch.py`.  Generates N genomes
    once (cached), measures batch genomes/min against per-genome ppref
    wall time, exercises --resume, and asserts byte-identity per
    genome.  One JSON line: genomes/min + vs_baseline."""
    import shutil
    import subprocess

    from polypolish_tpu.native import replica
    from polypolish_tpu.pipeline.batch import polish_batch
    from polypolish_tpu.utils.malloc_tuning import tune_malloc

    tune_malloc()
    assert replica.build() is not None, "cannot build ppref"
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))
    import workload

    n = args.n_genomes
    gdir = os.path.join(CACHE_DIR, f"config5_{n}_{args.seed}")
    jobs = []
    if not os.path.exists(os.path.join(gdir, "MANIFEST.tsv")):
        eprint(f"generating {n} genomes ...")
        os.makedirs(gdir, exist_ok=True)
        t0 = time.time()
        lines = []
        for i in range(n):
            fasta, sams, info = workload.make_paired_case(
                seed=args.seed * 10_000 + i, genome_len=500_000,
                coverage=25, read_len=150, repeat_len=8_000,
                repeat_copies=2,
            )
            asm = os.path.join(gdir, f"g{i}.fasta")
            with open(asm, "w") as f:
                f.write(fasta)
            sam_paths = []
            for j, s in enumerate(sams):
                p = os.path.join(gdir, f"g{i}_{j}.sam")
                with open(p, "w") as f:
                    f.write(s)
                sam_paths.append(p)
            lines.append(
                f"{asm}\t{os.path.join(gdir, f'g{i}.out.fasta')}\t"
                + ",".join(sam_paths)
            )
        with open(os.path.join(gdir, "MANIFEST.tsv"), "w") as f:
            f.write("\n".join(lines) + "\n")
        eprint(f"  generated in {time.time()-t0:.0f}s")
    from polypolish_tpu.pipeline.batch import parse_manifest

    jobs = parse_manifest(os.path.join(gdir, "MANIFEST.tsv"))

    # baseline: ppref one genome at a time (single core, the reference
    # deployment model), on a sample of genomes, extrapolated
    sample = jobs[: min(args.baseline_runs * 3, len(jobs))]
    t0 = time.time()
    ref_out = {}
    for asm, _outp, sams in sample:
        proc = replica.run_polish(asm, sams)
        assert proc.returncode == 0
        ref_out[asm] = proc.stdout
    base_per_genome = (time.time() - t0) / len(sample)
    eprint(f"ppref: {base_per_genome:.2f} s/genome over {len(sample)} "
           f"sampled genomes -> {60/base_per_genome:.1f} genomes/min")

    # best of 2 passes: the first pays process warmup (buffer pools,
    # page faults, import costs) — the steady state matches a
    # long-lived service, same framing as run_framework's best-of-N
    batch_s = float("inf")
    for _pass in range(2):
        for outp in [j[1] for j in jobs]:
            if os.path.exists(outp):
                os.remove(outp)
        t0 = time.time()
        results = polish_batch(jobs, backend="host")
        dt = time.time() - t0
        eprint(f"  batch pass: {dt:.2f}s = {len(jobs)/dt*60:.0f} g/min")
        batch_s = min(batch_s, dt)
        n_err = sum(1 for r in results if "error" in r)
        assert n_err == 0, f"{n_err} genomes failed"
    gpm = len(jobs) / batch_s * 60

    # byte-identity vs ppref on the sampled genomes
    for asm, outp, _sams in sample:
        with open(outp, "rb") as f:
            assert f.read() == ref_out[asm], f"{outp} != ppref output"

    # --resume: drop two outputs, re-run, only those two re-polish
    removed = [jobs[1][1], jobs[3][1]] if len(jobs) > 3 else [jobs[0][1]]
    for p in removed:
        os.remove(p)
    t0 = time.time()
    results2 = polish_batch(jobs, backend="host", resume=True)
    resume_s = time.time() - t0
    n_skipped = sum(1 for r in results2 if r.get("skipped"))
    assert n_skipped == len(jobs) - len(removed), (n_skipped, len(jobs))
    eprint(f"resume: re-polished {len(removed)} missing outputs in "
           f"{resume_s:.1f}s ({n_skipped} skipped)")

    # 2-process --shard-across-hosts over a localhost jax.distributed
    # coordinator (the DCN batch scale-out, executed for real)
    import socket
    import subprocess

    s = socket.socket(); s.bind(("localhost", 0))
    port = s.getsockname()[1]; s.close()
    for outp in [j[1] for j in jobs]:
        if os.path.exists(outp):
            os.remove(outp)
    t0 = time.time()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": str(pid),
            "JAX_PLATFORMS": "cpu", "POLYPOLISH_TPU_PLAIN_LOG": "1",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "polypolish_tpu", "batch",
             os.path.join(gdir, "MANIFEST.tsv"), "--shard-across-hosts"],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ))
    rcs = [p.wait(timeout=1200) for p in procs]
    two_proc_s = time.time() - t0
    assert all(rc == 0 for rc in rcs), rcs
    missing = [j[1] for j in jobs if not os.path.exists(j[1])]
    assert not missing, f"2-proc batch left {len(missing)} outputs missing"
    for asm, outp, _sams in sample:
        with open(outp, "rb") as f:
            assert f.read() == ref_out[asm], f"{outp} != ppref (2-proc)"
    eprint(f"2-process --shard-across-hosts: {len(jobs)} genomes in "
           f"{two_proc_s:.1f}s = {len(jobs)/two_proc_s*60:.1f} genomes/min")

    eprint(f"batch: {len(jobs)} genomes in {batch_s:.1f}s = "
           f"{gpm:.1f} genomes/min (ppref: {60/base_per_genome:.1f})")
    print(json.dumps({
        "metric": "batch_genomes_per_min",
        "value": round(gpm, 1),
        "unit": "genomes/min",
        "vs_baseline": round(gpm / (60 / base_per_genome), 2),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", action="store_true",
                    help="isolated vote-kernel mode (secondary metric)")
    # e2e knobs
    ap.add_argument("--genome-mb", type=float, default=4.6)
    ap.add_argument("--coverage", type=float, default=50)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--repeat-len", type=int, default=20_000)
    ap.add_argument("--repeat-copies", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--contigs", type=int, default=1,
                    help="split the e2e genome over N contigs (SURVEY "
                    "config-4 multi-contig shape)")
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--baseline-runs", type=int, default=3)
    ap.add_argument("--backend", default=None,
                    choices=(None, "host", "pallas", "xla"))
    # kernel knobs
    ap.add_argument("--events", type=int, default=20_000_000)
    ap.add_argument("--positions", type=int, default=2_000_000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--tile-p", type=int, default=None)
    ap.add_argument("--e-sub", type=int, default=None)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--variant", default="lanes",
                    choices=("lanes", "unfused", "fused", "split"))
    ap.add_argument("--ab", action="store_true",
                    help="A/B all kernel variants in-process")
    ap.add_argument("--xla", action="store_true")
    ap.add_argument("--no-check", action="store_true")
    ap.add_argument("--device-profile", action="store_true",
                    help="steady-state device-path e2e with phase split")
    ap.add_argument("--cap", action="store_true",
                    help="kernel mode: bench the depth-stratified cap "
                    "layout (lower pad, but the overflow scatter-add "
                    "costs ~8 ns/event on-chip — a win only where "
                    "upload bytes dominate, i.e. the device e2e path)")
    ap.add_argument("--lanes-body", default="packed4",
                    choices=("packed", "cmp", "packed4", "packed8"),
                    help="--kernel lanes body (packed8 = nibble wire "
                    "format, ~0.5 B/event)")
    ap.add_argument("--ov-mode", default="scatter",
                    choices=("scatter", "mxu"),
                    help="--kernel --cap overflow mechanism: XLA "
                    "scatter-add or the MXU chunks Pallas kernel")
    ap.add_argument("--no-cap", action="store_true",
                    help="deprecated alias (uncapped is the default)")
    ap.add_argument("--no-chip", action="store_true",
                    help="skip the TPU kernel/e2e extras in default mode")
    ap.add_argument("--config5", action="store_true",
                    help="batch-of-genomes mode (BASELINE.md config 5)")
    ap.add_argument("--n-genomes", type=int, default=100)
    args = ap.parse_args()

    if args.config5:
        main_config5(args)
    elif args.device_profile:
        main_device_profile(args)
    elif args.kernel or args.sweep or args.ab or args.xla:
        main_kernel(args)
    else:
        main_e2e(args)


if __name__ == "__main__":
    main()
