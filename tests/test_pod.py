"""Pod-mode (host-sharded SAM ingest) must be byte-identical to the
single-host pipeline: counts merge as integers, sparse ids remap into
the merged vocab, and depth is replayed from the gathered run headers
in exact reference order (BASELINE config 4 mechanism)."""

import io

import numpy as np
import pytest

import synth

from polypolish_tpu import log
from polypolish_tpu.native import loader
from polypolish_tpu.pipeline.pod import polish_pod
from polypolish_tpu.pipeline.polish import polish

pytestmark = pytest.mark.skipif(
    not loader.available(), reason="native library unavailable"
)


def _write(tmp_path, fasta, sam_text):
    asm = tmp_path / "asm.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "aln.sam"
    sam.write_text(sam_text)
    return str(asm), str(sam)


def _single(tmp_path, asm, sams, tag, careful=False):
    dbg = str(tmp_path / f"s_{tag}.tsv")
    out = io.StringIO()
    with log.quiet():
        polish(dbg, 0.2, 0.5, 10, 5, careful, asm, sams, out=out,
               backend="host")
    return out.getvalue(), open(dbg).read()


def _pod(tmp_path, asm, sams, n_procs, tag, careful=False):
    dbg = str(tmp_path / f"p_{tag}.tsv")
    out = io.StringIO()
    with log.quiet():
        polish_pod(dbg, 0.2, 0.5, 10, 5, careful, asm, sams, n_procs,
                   out=out)
    return out.getvalue(), open(dbg).read()


@pytest.mark.parametrize("n_procs", [2, 3, 5])
def test_pod_matches_single(tmp_path, n_procs):
    fasta, sam_text = synth.make_polish_case(
        seed=31, genome_len=900, n_reads=700, read_len=45, err=0.06,
        multi_frac=0.35,
    )
    asm, sam = _write(tmp_path, fasta, sam_text)
    ref = _single(tmp_path, asm, [sam], f"n{n_procs}")
    got = _pod(tmp_path, asm, [sam], n_procs, f"n{n_procs}")
    assert got[0] == ref[0]
    assert got[1] == ref[1]


def test_pod_two_files_multi_contig(tmp_path):
    fasta, sam_text = synth.make_multi_contig_case(
        seed=7, n_contigs=3, genome_len=400, n_reads=400, read_len=40,
    )
    asm = tmp_path / "asm.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam1 = tmp_path / "a1.sam"
    sam1.write_text(sam_text)
    _, sam2_text = synth.make_multi_contig_case(
        seed=8, n_contigs=3, genome_len=400, n_reads=300, read_len=40,
        n_draft_errors=0,
    )
    sam2 = tmp_path / "a2.sam"
    sam2.write_text(sam2_text)
    sams = [str(sam1), str(sam2)]
    ref = _single(tmp_path, str(asm), sams, "mc")
    got = _pod(tmp_path, str(asm), sams, 3, "mc")
    assert got[0] == ref[0]
    assert got[1] == ref[1]


def test_pod_more_procs_than_groups(tmp_path):
    """Shard count far beyond the read count: most ranges are empty."""
    fasta, sam_text = synth.make_polish_case(
        seed=3, genome_len=200, n_reads=12, read_len=30,
    )
    asm, sam = _write(tmp_path, fasta, sam_text)
    ref = _single(tmp_path, asm, [sam], "tiny")
    got = _pod(tmp_path, asm, [sam], 8, "tiny")
    assert got[0] == ref[0]
    assert got[1] == ref[1]
