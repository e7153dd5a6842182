"""End-to-end polish benchmark at E. coli-like scale (BASELINE config 2/3
shape): synthetic draft genome + ~coverage x reads with errors and
multi-mapped secondaries, through the full pipeline (parse -> pack ->
vote -> consensus -> FASTA).

Usage: python benchmarks/e2e_bench.py [--genome-mb 1.0] [--coverage 50]
           [--backend host|xla|pallas] [--threads N] [--keep]
"""

from __future__ import annotations

import argparse
import hashlib
import io
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import synth  # noqa: E402


def make_inputs(genome_mb: float, coverage: int, read_len: int, cache_dir: str):
    genome_len = int(genome_mb * 1e6)
    n_reads = int(genome_len * coverage / read_len)
    key = hashlib.md5(
        f"{genome_len}_{coverage}_{read_len}_v1".encode()
    ).hexdigest()[:10]
    asm = os.path.join(cache_dir, f"bench_{key}.fasta")
    sam = os.path.join(cache_dir, f"bench_{key}.sam")
    if not (os.path.exists(asm) and os.path.exists(sam)):
        print(
            f"generating {genome_mb} Mb genome, {n_reads:,} reads "
            f"({coverage}x)...", file=sys.stderr,
        )
        t0 = time.time()
        fasta, sam_text = synth.make_polish_case(
            seed=0, genome_len=genome_len, n_reads=n_reads,
            read_len=read_len, n_draft_errors=max(10, genome_len // 20000),
            err=0.01, multi_frac=0.15,
        )
        with open(asm, "w") as f:
            f.write(synth.fasta_text(fasta))
        with open(sam, "w") as f:
            f.write(sam_text)
        print(f"  generated in {time.time() - t0:.1f}s", file=sys.stderr)
    return asm, sam


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=1.0)
    ap.add_argument("--coverage", type=int, default=50)
    ap.add_argument("--read-len", type=int, default=100)
    ap.add_argument("--backend", default="host")
    ap.add_argument("--threads", type=int, default=None)
    ap.add_argument("--pure-python", action="store_true")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    if args.threads is not None:
        os.environ["POLYPOLISH_TPU_THREADS"] = str(args.threads)
    os.environ.setdefault("POLYPOLISH_TPU_TIMINGS", "1")

    cache = os.path.join(tempfile.gettempdir(), "polypolish_tpu_bench")
    os.makedirs(cache, exist_ok=True)
    asm, sam = make_inputs(args.genome_mb, args.coverage, args.read_len, cache)
    sam_mb = os.path.getsize(sam) / 1e6
    print(f"SAM size: {sam_mb:.1f} MB", file=sys.stderr)

    from polypolish_tpu.pipeline.polish import polish
    from polypolish_tpu.utils.profiling import reset_timings, timings
    from polypolish_tpu import log

    best = None
    for r in range(args.repeats):
        reset_timings()
        out = io.StringIO()
        with log.quiet():
            t0 = time.time()
            polish(
                None, 0.2, 0.5, 10, 5, False, asm, [sam],
                out=out, backend=args.backend,
                use_native=not args.pure_python,
            )
            dt = time.time() - t0
        phases = timings()
        print(
            f"run {r}: total {dt:.2f}s  "
            + "  ".join(f"{k}={v:.2f}s" for k, v in phases.items()),
            file=sys.stderr,
        )
        if best is None or dt < best[0]:
            best = (dt, phases)

    dt, phases = best
    import json

    n_bases = args.genome_mb * 1e6 * args.coverage
    print(json.dumps({
        "metric": "e2e_polish_wall_time",
        "backend": args.backend,
        "genome_mb": args.genome_mb,
        "coverage": args.coverage,
        "sam_mb": round(sam_mb, 1),
        "seconds": round(dt, 2),
        "aligned_mbp_per_s": round(n_bases / dt / 1e6, 1),
        "phases": {k: round(v, 2) for k, v in phases.items()},
    }))


if __name__ == "__main__":
    main()
