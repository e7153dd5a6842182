"""`polish --backend sharded` production path: the full driver must run
the lane-aligned VPU SPMD step (native pp_lanes_mesh pack + per-shard
lanes kernel + exact int psum) and produce byte-identical FASTA/TSV to
the host backend (round-4 wiring of the round-3 flagship kernel into
the production multi-chip path; reference scope pileup.rs:56-65 /
polish.rs:26-38 at pod scale)."""

import gzip
import io
import importlib

import pytest

import tests.synth as synth
from polypolish_tpu import log
from polypolish_tpu.native import loader

polish_mod = importlib.import_module("polypolish_tpu.pipeline.polish")
shard_mod = importlib.import_module("polypolish_tpu.parallel.shard")


def _write_case(tmp_path, gz=False):
    fasta, sam_text = synth.make_multi_contig_case(
        seed=11, n_contigs=2, genome_len=800, n_reads=900, read_len=40,
    )
    asm = tmp_path / "asm.fasta"
    asm.write_text(synth.fasta_text(fasta))
    if gz:
        sam = tmp_path / "aln.sam.gz"
        sam.write_bytes(gzip.compress(sam_text.encode()))
    else:
        sam = tmp_path / "aln.sam"
        sam.write_text(sam_text)
    return str(asm), str(sam)


def _run(asm, sam, backend, tmp_path, tag):
    dbg = tmp_path / f"dbg_{tag}.tsv"
    out = io.StringIO()
    with log.quiet():
        polish_mod.polish(str(dbg), 0.2, 0.5, 10, 5, False, asm, [sam],
                          out=out, backend=backend)
    return out.getvalue(), dbg.read_text()


@pytest.mark.skipif(not loader.available(),
                    reason="native library unavailable")
def test_sharded_backend_runs_lanes_step(tmp_path):
    """Native-runs input: the sharded backend must execute the lanes
    SPMD step (not the legacy scatter fallback) and match host."""
    asm, sam = _write_case(tmp_path)
    host = _run(asm, sam, "host", tmp_path, "host")
    shard_mod._STEP_CACHE.clear()
    sharded = _run(asm, sam, "sharded", tmp_path, "sharded")
    assert sharded == host
    assert shard_mod._STEP_CACHE, (
        "sharded backend fell back to the scatter path — the lanes "
        "SPMD step was never built"
    )


@pytest.mark.skipif(not loader.available(),
                    reason="native library unavailable")
def test_sharded_backend_gzip_numpy_packer(tmp_path):
    """Gzipped SAM has no native runs handle; the sharded backend must
    still take the lanes step via the vectorised numpy mesh packer."""
    asm_p, sam_p = _write_case(tmp_path)
    asm_g, sam_g = _write_case(tmp_path, gz=True)
    host = _run(asm_p, sam_p, "host", tmp_path, "hostg")
    shard_mod._STEP_CACHE.clear()
    sharded = _run(asm_g, sam_g, "sharded", tmp_path, "shardedg")
    assert sharded == host
    assert shard_mod._STEP_CACHE


@pytest.mark.skipif(not loader.available(),
                    reason="native library unavailable")
def test_sharded_backend_mxu_fallback(tmp_path, monkeypatch):
    """--kernel-variant mxu keeps the XLA scatter SPMD step as the
    sharded fallback — still byte-identical."""
    monkeypatch.setenv("POLYPOLISH_TPU_KERNEL", "mxu")
    asm, sam = _write_case(tmp_path)
    host = _run(asm, sam, "host", tmp_path, "hostm")
    sharded = _run(asm, sam, "sharded", tmp_path, "shardedm")
    assert sharded == host
