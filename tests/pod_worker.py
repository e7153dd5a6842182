"""One real JAX process of a distributed pod polish job.

Launched by tests/test_pod_distributed.py (N processes over a localhost
coordinator, CPU backend with Gloo collectives) — the same code path a
TPU pod runs over ICI/DCN.  Process 0 writes the FASTA (and --debug TSV)
to the given paths.
"""

import argparse
import io
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--assembly", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--debug", default=None)
    ap.add_argument("sam", nargs="+")
    args = ap.parse_args()

    os.environ.setdefault("POLYPOLISH_TPU_PLAIN_LOG", "1")
    import jax

    # the axon plugin overrides JAX_PLATFORMS (see tests/conftest.py);
    # force CPU via jax.config before any backend initialises
    jax.config.update("jax_platforms", "cpu")

    from polypolish_tpu.parallel.multihost import initialize_distributed

    assert initialize_distributed(
        f"localhost:{args.port}", args.nprocs, args.pid
    )
    assert jax.process_count() == args.nprocs

    from polypolish_tpu import log
    from polypolish_tpu.pipeline.pod_distributed import (
        polish_pod_distributed,
    )

    out = io.StringIO()
    with log.quiet():
        polish_pod_distributed(
            args.debug, 0.2, 0.5, 10, 5, False,
            args.assembly, list(args.sam), out=out,
        )
    if jax.process_index() == 0:
        with open(args.out, "w") as f:
            f.write(out.getvalue())


if __name__ == "__main__":
    main()
