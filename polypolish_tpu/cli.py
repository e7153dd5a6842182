"""Command-line interface (reference: main.rs:23-126).

Flag-for-flag parity with the reference's two subcommands:

  polypolish-tpu filter --in1 .. --in2 .. --out1 .. --out2 ..
                        [--orientation auto] [--low 0.1] [--high 99.9]
  polypolish-tpu polish [--debug FILE] [-i 0.2] [-v 0.5] [-m 10] [-d 5]
                        [--careful] assembly sam [sam ...]

Extra TPU-runtime flags (no reference counterpart): ``--backend`` to pick
the vote/consensus execution backend and ``--pure-python`` to disable the
native SAM packer.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import List, Optional

from polypolish_tpu import TOOL_NAME, __version__
from polypolish_tpu.errors import PolypolishError, render_error_and_exit

BANNER = r"""  _____        _                       _  _       _
 |  __ \      | |                     | |(_)     | |
 | |__) |___  | | _   _  _ __    ___  | | _  ___ | |__
 |  ___// _ \ | || | | || '_ \  / _ \ | || |/ __|| '_ \
 | |   | (_) || || |_| || |_) || (_) || || |\__ \| | | |
 |_|    \___/ |_| \__, || .__/  \___/ |_||_||___/|_| |_|
                   __/ || |                 (TPU-native)
                  |___/ |_|"""


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="polypolish-tpu",
        description=(
            f"{TOOL_NAME} v{__version__}: short-read polishing of long-read "
            "assemblies, TPU-native"
        ),
    )
    parser.add_argument(
        "--version", action="version", version=f"{TOOL_NAME} v{__version__}"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    f = sub.add_parser(
        "filter", help="filter paired-end alignments based on insert size"
    )
    f.add_argument("--in1", required=True, help="Input SAM file - first read in pairs")
    f.add_argument("--in2", required=True, help="Input SAM file - second read in pairs")
    f.add_argument("--out1", required=True, help="Output SAM file - first read in pairs")
    f.add_argument("--out2", required=True, help="Output SAM file - second read in pairs")
    f.add_argument(
        "--orientation", default="auto", help="Expected pair orientation (default: auto)"
    )
    f.add_argument(
        "--low", type=float, default=0.1, help="Low percentile threshold (default: 0.1)"
    )
    f.add_argument(
        "--high", type=float, default=99.9,
        help="High percentile threshold (default: 99.9)",
    )

    p = sub.add_parser(
        "polish", help="polish a long-read assembly using short-read alignments"
    )
    p.add_argument(
        "--debug", default=None,
        help="Optional file to store per-base information for debugging purposes",
    )
    p.add_argument(
        "-i", "--fraction_invalid", type=float, default=0.2,
        help="A base must make up less than this fraction of the read depth "
        "to be considered invalid (default: 0.2)",
    )
    p.add_argument(
        "-v", "--fraction_valid", type=float, default=0.5,
        help="A base must make up at least this fraction of the read depth "
        "to be considered valid (default: 0.5)",
    )
    p.add_argument(
        "-m", "--max_errors", type=int, default=10,
        help="Ignore alignments with more than this many mismatches and "
        "indels (default: 10)",
    )
    p.add_argument(
        "-d", "--min_depth", type=int, default=5,
        help="A base must occur at least this many times in the pileup to "
        "be considered valid (default: 5)",
    )
    p.add_argument(
        "--careful", action="store_true",
        help="Ignore any reads with multiple alignments",
    )
    p.add_argument(
        "--backend", default="auto",
        choices=("auto", "host", "xla", "pallas", "sharded"),
        help="Vote/consensus execution backend (default: auto = device if "
        "a TPU is attached, else host; 'sharded' = SPMD over all devices)",
    )
    p.add_argument(
        "--kernel-variant", default=None, choices=("lanes", "mxu"),
        help="Device vote kernel for --backend pallas: 'lanes' "
        "(lane-aligned VPU kernel, default) or 'mxu' (one-hot matmul)",
    )
    p.add_argument(
        "--pure-python", action="store_true",
        help="Disable the native (C++) SAM packer",
    )
    p.add_argument(
        "--threads", type=int, default=None,
        help="Native SAM packer threads (default: all cores, max 16; "
        "output is bit-identical for any value)",
    )
    p.add_argument(
        "--pod-shards", type=int, default=0,
        help="Shard the SAM ingest over N byte-range shards (config-4 "
        "pod mode; output is bit-identical to unsharded)",
    )
    p.add_argument(
        "--distributed", action="store_true",
        help="Multi-process pod polish: launch one copy of this command "
        "per host, shard the SAM ingest across processes, and merge "
        "counts with jax collectives. Coordinator comes from "
        "--coordinator/--num-processes/--process-id, the "
        "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID env "
        "vars, or TPU pod auto-detection. Process 0 writes the output; "
        "bit-identical to single-process polish",
    )
    p.add_argument(
        "--coordinator", default=None,
        help="jax.distributed coordinator address host:port "
        "(with --distributed)",
    )
    p.add_argument(
        "--num-processes", type=int, default=None,
        help="Total process count (with --distributed)",
    )
    p.add_argument(
        "--process-id", type=int, default=None,
        help="This process's index (with --distributed)",
    )
    p.add_argument("assembly", help="Assembly to polish (one file in FASTA format)")
    p.add_argument(
        "sam", nargs="+", help="Short read alignments (one or more files in SAM format)"
    )

    b = sub.add_parser(
        "batch",
        help="polish many genomes from a manifest (TPU extension; "
        "no reference counterpart)",
    )
    b.add_argument(
        "manifest",
        help="TSV manifest: assembly<TAB>output<TAB>sam1[,sam2...] per line",
    )
    b.add_argument("-i", "--fraction_invalid", type=float, default=0.2)
    b.add_argument("-v", "--fraction_valid", type=float, default=0.5)
    b.add_argument("-m", "--max_errors", type=int, default=10)
    b.add_argument("-d", "--min_depth", type=int, default=5)
    b.add_argument("--careful", action="store_true")
    b.add_argument(
        "--backend", default="auto",
        choices=("auto", "host", "xla", "pallas", "sharded"),
        help="Vote/consensus execution backend per genome (default: "
        "auto; 'sharded' = SPMD over all devices)",
    )
    b.add_argument(
        "--kernel-variant", default=None, choices=("lanes", "mxu"),
        help="Device vote kernel for the device backends",
    )
    b.add_argument("--workers", type=int, default=None)
    b.add_argument(
        "--threads", type=int, default=None,
        help="Native SAM packer threads per genome (default: 1 when "
        "several genomes are in flight; output is bit-identical)",
    )
    b.add_argument("--pure-python", action="store_true")
    b.add_argument(
        "--resume", action="store_true",
        help="Skip jobs whose output already exists and is newer than "
        "its inputs",
    )
    b.add_argument(
        "--shard-across-hosts", action="store_true",
        help="Pod-slice batch mode: each host process polishes the "
        "jobs[process_index::process_count] slice of the manifest "
        "(initialises jax.distributed first)",
    )

    r = sub.add_parser(
        "full",
        help="one-shot paired-end workflow: filter then polish "
        "(the reference's documented two-command pipeline)",
    )
    r.add_argument("--in1", required=True, help="Input SAM - first read in pairs")
    r.add_argument("--in2", required=True, help="Input SAM - second read in pairs")
    r.add_argument("--orientation", default="auto")
    r.add_argument("--low", type=float, default=0.1)
    r.add_argument("--high", type=float, default=99.9)
    r.add_argument("--debug", default=None)
    r.add_argument("-i", "--fraction_invalid", type=float, default=0.2)
    r.add_argument("-v", "--fraction_valid", type=float, default=0.5)
    r.add_argument("-m", "--max_errors", type=int, default=10)
    r.add_argument("-d", "--min_depth", type=int, default=5)
    r.add_argument("--careful", action="store_true")
    r.add_argument(
        "--backend", default="auto",
        choices=("auto", "host", "xla", "pallas", "sharded"),
    )
    r.add_argument(
        "--kernel-variant", default=None, choices=("lanes", "mxu"),
        help="Device vote kernel for the device backends",
    )
    r.add_argument("--pure-python", action="store_true")
    r.add_argument("--threads", type=int, default=None)
    r.add_argument(
        "--pod-shards", type=int, default=0,
        help="Shard the polish-stage SAM ingest over N byte-range "
        "shards (output is bit-identical to unsharded)",
    )
    r.add_argument(
        "--keep-filtered", default=None,
        help="Directory to keep the intermediate filtered SAMs",
    )
    r.add_argument("assembly", help="Assembly to polish (FASTA)")
    return parser


def _resolve_backend(requested: str, sam_paths=None,
                     mean_job_sams=None) -> str:
    """auto = predicted fastest backend for THIS workload: the cost
    model in utils/transport.py compares the measured link (bandwidth +
    per-dispatch latency) against the host engine on the known SAM byte
    count, instead of the round-3 single bandwidth threshold (which sat
    inside the tunnel's measured band).  Falls back to the host engine
    with a note whenever the device path is predicted slower.

    mean_job_sams: batch mode — a sample of per-job SAM path lists; the
    model runs on the MEAN job size (the prediction applies per genome,
    and the first manifest entry may be unrepresentative)."""
    if requested != "auto":
        return requested
    try:
        from polypolish_tpu.utils.transport import predict_backend

        def _size(paths):
            total = 0
            for p in paths or []:
                try:
                    total += os.path.getsize(p)
                except OSError:
                    pass
            return total

        if mean_job_sams:
            sizes = [_size(job) for job in mean_job_sams]
            sizes = [s for s in sizes if s > 0]
            sam_bytes = int(sum(sizes) / len(sizes)) if sizes else 0
        else:
            sam_bytes = _size(sam_paths)
        if sam_bytes <= 0:
            sam_bytes = 500 << 20  # unknown workload: config-2 scale
        choice, details = predict_backend(sam_bytes)
        if choice == "host" and "predicted_device_s" in details:
            print(
                "note: TPU attached but the device path is predicted "
                f"slower on this link for this workload "
                f"(device ~{details['predicted_device_s']}s vs host "
                f"~{details['predicted_host_s']}s); using the host "
                "backend (--backend pallas to force the device path)",
                file=sys.stderr,
            )
        return choice
    except Exception:
        return "host"


def main(argv: Optional[List[str]] = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if not argv:
        print(BANNER, file=sys.stderr)
        build_parser().print_help(sys.stderr)
        return 2
    args = build_parser().parse_args(argv)
    import os

    if getattr(args, "kernel_variant", None):
        os.environ["POLYPOLISH_TPU_KERNEL"] = args.kernel_variant

    platform = os.environ.get("POLYPOLISH_TPU_PLATFORM")
    if platform:
        # Force the JAX platform via jax.config: some TPU plugins
        # override the JAX_PLATFORMS environment variable, so an env
        # var alone is not reliable.
        import jax

        jax.config.update("jax_platforms", platform)
    from polypolish_tpu.utils.compile_cache import enable_persistent_cache
    from polypolish_tpu.utils.malloc_tuning import tune_malloc

    enable_persistent_cache()
    tune_malloc()
    try:
        if args.command == "filter":
            from polypolish_tpu.pipeline.filtering import filter_pairs

            filter_pairs(
                args.in1, args.in2, args.out1, args.out2,
                args.orientation, args.low, args.high,
            )
        elif args.command == "polish":
            if args.distributed:
                from polypolish_tpu.parallel.multihost import (
                    initialize_distributed,
                )
                from polypolish_tpu.pipeline.pod_distributed import (
                    polish_pod_distributed,
                )

                # The FASTA rides stdout, but distributed backends'
                # native layers (e.g. Gloo's connection banner) write to
                # fd 1 directly.  Keep the real stdout for the FASTA and
                # repoint fd 1 at stderr so native chatter cannot
                # corrupt the output stream.
                fasta_out = os.fdopen(os.dup(1), "w")
                sys.stdout.flush()
                os.dup2(2, 1)
                if not initialize_distributed(
                    args.coordinator, args.num_processes, args.process_id
                ):
                    from polypolish_tpu.errors import quit_with_error

                    quit_with_error(
                        "--distributed requires a coordinator: pass "
                        "--coordinator/--num-processes/--process-id, set "
                        "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                        "JAX_PROCESS_ID, or run under a TPU pod runtime"
                    )
                try:
                    polish_pod_distributed(
                        args.debug, args.fraction_invalid,
                        args.fraction_valid, args.max_errors,
                        args.min_depth, args.careful,
                        args.assembly, args.sam, out=fasta_out,
                        n_threads=args.threads,
                    )
                finally:
                    fasta_out.flush()
            elif args.pod_shards and args.pod_shards > 1:
                from polypolish_tpu.errors import quit_with_error
                from polypolish_tpu.pipeline.pod import polish_pod

                # pod-sharded ingest needs the native byte-range parser
                # and runs votes/consensus through the host fold
                if args.pure_python:
                    quit_with_error(
                        "--pod-shards requires the native engine and is "
                        "incompatible with --pure-python"
                    )
                if args.backend not in ("host", "auto"):
                    print(
                        f"note: --pod-shards uses the host fold; "
                        f"ignoring --backend {args.backend}",
                        file=sys.stderr,
                    )
                polish_pod(
                    args.debug, args.fraction_invalid, args.fraction_valid,
                    args.max_errors, args.min_depth, args.careful,
                    args.assembly, args.sam, args.pod_shards,
                    n_threads=args.threads,
                )
            else:
                from polypolish_tpu.pipeline.polish import polish

                polish(
                    args.debug, args.fraction_invalid, args.fraction_valid,
                    args.max_errors, args.min_depth, args.careful,
                    args.assembly, args.sam,
                    backend=_resolve_backend(args.backend, args.sam),
                    use_native=not args.pure_python,
                    n_threads=args.threads,
                )
        elif args.command == "batch":
            from polypolish_tpu.pipeline.batch import parse_manifest, polish_batch

            jobs = parse_manifest(args.manifest)
            if args.shard_across_hosts:
                from polypolish_tpu.parallel.multihost import (
                    initialize_distributed,
                )

                initialize_distributed()
            results = polish_batch(
                jobs,
                fraction_invalid=args.fraction_invalid,
                fraction_valid=args.fraction_valid,
                max_errors=args.max_errors,
                min_depth=args.min_depth,
                careful=args.careful,
                backend=_resolve_backend(
                    args.backend,
                    # model the AVERAGE job (the prediction applies per
                    # genome): sample up to 20 manifests' SAM sizes
                    mean_job_sams=[j[2] for j in jobs[:20]],
                ),
                use_native=not args.pure_python,
                workers=args.workers,
                resume=args.resume,
                shard_across_hosts=args.shard_across_hosts,
                n_threads=args.threads,
            )
            if any("error" in r for r in results):
                return 1
        elif args.command == "full":
            from polypolish_tpu.pipeline.full import polish_paired

            polish_paired(
                args.assembly, args.in1, args.in2,
                orientation=args.orientation, low=args.low, high=args.high,
                debug=args.debug,
                fraction_invalid=args.fraction_invalid,
                fraction_valid=args.fraction_valid,
                max_errors=args.max_errors, min_depth=args.min_depth,
                careful=args.careful,
                backend=_resolve_backend(args.backend,
                                         [args.in1, args.in2]),
                use_native=not args.pure_python,
                n_threads=args.threads,
                pod_shards=args.pod_shards,
                keep_filtered=args.keep_filtered,
            )
    except PolypolishError as e:
        render_error_and_exit(e)
    return 0


if __name__ == "__main__":
    sys.exit(main())
