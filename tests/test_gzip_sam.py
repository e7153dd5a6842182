"""Gzipped SAM support (extension over the reference): polish and
filter accept .gz inputs transparently; filter writes .gz outputs when
the output name ends in .gz."""

import gzip
import io

import pytest

import synth
from oracle import oracle_filter, oracle_polish

from polypolish_tpu.pipeline.filtering import filter_pairs
from polypolish_tpu.pipeline.polish import polish


def test_polish_gzipped_sam(tmp_path):
    fasta, sam_text = synth.make_polish_case(seed=40, n_reads=150)
    asm = tmp_path / "asm.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam_gz = tmp_path / "aln.sam.gz"
    sam_gz.write_bytes(gzip.compress(sam_text.encode()))

    expected, _ = oracle_polish(fasta, [sam_text])
    for use_native in (False, True):
        out = io.StringIO()
        polish(
            None, 0.2, 0.5, 10, 5, False, str(asm), [str(sam_gz)],
            out=out, backend="host", use_native=use_native,
        )
        lines = out.getvalue().splitlines()
        assert lines[1] == expected["contig_1"]


def test_filter_gzipped_sam(tmp_path):
    sam1, sam2 = synth.make_filter_case(seed=41, n_pairs=120)
    in1 = tmp_path / "i1.sam.gz"
    in2 = tmp_path / "i2.sam.gz"
    out1 = tmp_path / "o1.sam.gz"
    out2 = tmp_path / "o2.sam"
    in1.write_bytes(gzip.compress(sam1.encode()))
    in2.write_bytes(gzip.compress(sam2.encode()))
    filter_pairs(str(in1), str(in2), str(out1), str(out2))

    v1, v2, _, _, _ = oracle_filter(sam1, sam2)
    got1 = gzip.decompress(out1.read_bytes()).decode()
    got2 = out2.read_text()

    def expected_output(sam_text, verdicts):
        out_lines = []
        idx = 0
        for line in sam_text.splitlines():
            if line.startswith("@"):
                out_lines.append(line)
                continue
            if int(line.split("\t")[1]) & 4:
                out_lines.append(line)
                continue
            out_lines.append(line if verdicts[idx] else line + "\tZP:Z:fail")
            idx += 1
        return "\n".join(out_lines) + "\n"

    assert got1 == expected_output(sam1, v1)
    assert got2 == expected_output(sam2, v2)
