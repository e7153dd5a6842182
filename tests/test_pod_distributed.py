"""REAL multi-process pod polish over jax.distributed (localhost
coordinator, CPU backend, Gloo collectives — the code path a TPU pod
runs over ICI/DCN): N processes each parse only their byte-range shard
of every SAM file, dense counts merge via an actual jax.lax.psum over
the global device mesh, headers/sparse/vocab travel via
multihost_utils.process_allgather, and process 0's FASTA + --debug TSV
must be byte-identical to single-process polish().

This executes the distributed half that pipeline/pod.py simulates
in-process (SURVEY §2 "Data parallelism (reads)" / "Distributed
communication backend")."""

import io
import socket
import subprocess
import sys
import os

import pytest

import synth

from polypolish_tpu import log
from polypolish_tpu.native import loader
from polypolish_tpu.pipeline.polish import polish

pytestmark = pytest.mark.skipif(
    not loader.available(), reason="native library unavailable"
)

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "pod_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single(tmp_path, asm, sams, tag):
    dbg = str(tmp_path / f"s_{tag}.tsv")
    out = io.StringIO()
    with log.quiet():
        polish(dbg, 0.2, 0.5, 10, 5, False, asm, sams, out=out,
               backend="host")
    return out.getvalue(), open(dbg).read()


def _distributed(tmp_path, asm, sams, n_procs, tag):
    port = _free_port()
    out_path = str(tmp_path / f"d_{tag}.fasta")
    dbg_path = str(tmp_path / f"d_{tag}.tsv")
    procs = []
    for pid in range(n_procs):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--pid", str(pid),
             "--nprocs", str(n_procs), "--port", str(port),
             "--assembly", asm, "--out", out_path, "--debug", dbg_path]
            + list(sams),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ))
    for p in procs:
        try:
            _, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]
    return open(out_path).read(), open(dbg_path).read()


@pytest.mark.parametrize("n_procs", [2, 3])
def test_distributed_pod_matches_single(tmp_path, n_procs):
    fasta, sam_text = synth.make_polish_case(
        seed=41, genome_len=700, n_reads=500, read_len=45, err=0.06,
        multi_frac=0.35,
    )
    asm = tmp_path / "asm.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "aln.sam"
    sam.write_text(sam_text)
    ref = _single(tmp_path, str(asm), [str(sam)], f"n{n_procs}")
    got = _distributed(tmp_path, str(asm), [str(sam)], n_procs,
                       f"n{n_procs}")
    assert got[0] == ref[0]
    assert got[1] == ref[1]


def test_distributed_pod_cli_surface(tmp_path):
    """Drive `polish --distributed` at the real CLI: 2 processes over a
    localhost coordinator; process 0's stdout must be EXACTLY the FASTA
    (Gloo's fd-1 banner must not leak into it) and process 1's stdout
    must be empty."""
    fasta, sam_text = synth.make_polish_case(
        seed=17, genome_len=600, n_reads=400, read_len=45, err=0.05,
        multi_frac=0.3,
    )
    asm = tmp_path / "asm.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "aln.sam"
    sam.write_text(sam_text)
    ref_fasta, ref_tsv = _single(tmp_path, str(asm), [str(sam)], "cli")
    port = _free_port()
    dbg = str(tmp_path / "cli.tsv")
    env = dict(os.environ,
               POLYPOLISH_TPU_PLATFORM="cpu",
               POLYPOLISH_TPU_PLAIN_LOG="1")
    procs = [subprocess.Popen(
        [sys.executable, "-m", "polypolish_tpu.cli", "polish",
         "--distributed", "--coordinator", f"localhost:{port}",
         "--num-processes", "2", "--process-id", str(pid),
         "--debug", dbg, str(asm), str(sam)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
    ) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            o, e = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, e.decode()[-2000:]
        outs.append(o.decode())
    assert outs[0] == ref_fasta
    assert outs[1] == ""
    assert open(dbg).read() == ref_tsv


def test_distributed_pod_two_files_multi_contig(tmp_path):
    fasta, sam_text = synth.make_multi_contig_case(
        seed=9, n_contigs=2, genome_len=400, n_reads=300, read_len=40,
    )
    asm = tmp_path / "asm.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam1 = tmp_path / "a1.sam"
    sam1.write_text(sam_text)
    _, sam2_text = synth.make_multi_contig_case(
        seed=10, n_contigs=2, genome_len=400, n_reads=200, read_len=40,
        n_draft_errors=0,
    )
    sam2 = tmp_path / "a2.sam"
    sam2.write_text(sam2_text)
    sams = [str(sam1), str(sam2)]
    ref = _single(tmp_path, str(asm), sams, "mc")
    got = _distributed(tmp_path, str(asm), sams, 2, "mc")
    assert got[0] == ref[0]
    assert got[1] == ref[1]


def test_distributed_pod_device_votes(tmp_path, monkeypatch):
    """POLYPOLISH_TPU_POD_DEVICE_VOTES=1: every process votes its shard
    through the lanes kernel (interpret mode here; each process's own
    chip on a real pod) before the psum — output must stay byte-
    identical to single-process host polish."""
    monkeypatch.setenv("POLYPOLISH_TPU_POD_DEVICE_VOTES", "1")
    fasta, sam_text = synth.make_polish_case(
        seed=53, genome_len=600, n_reads=450, read_len=45, err=0.07,
        multi_frac=0.4,
    )
    asm = tmp_path / "asm.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "aln.sam"
    sam.write_text(sam_text)
    ref = _single(tmp_path, str(asm), [str(sam)], "dv")
    got = _distributed(tmp_path, str(asm), [str(sam)], 2, "dv")
    assert got[0] == ref[0]
    assert got[1] == ref[1]
