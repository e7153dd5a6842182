"""The one-shot filter->polish workflow vs oracle-composed stages."""

import io

import numpy as np
import pytest

import synth
from oracle import oracle_filter, oracle_polish

from polypolish_tpu.pipeline.full import polish_paired
from polypolish_tpu.cli import main


def _make_paired_polish_case(tmp_path, seed):
    rng = np.random.default_rng(seed)
    genome_len = 3000
    contigs = ("cA", "cB")
    sam1, sam2 = synth.make_filter_case(
        seed=seed, genome_len=genome_len, n_pairs=400,
        contig_names=contigs, multi_frac=0.4,
    )
    # reconstruct the same genomes the generator used (same rng stream)
    rng2 = np.random.default_rng(seed)
    genomes = {c: synth.rand_seq(rng2, genome_len) for c in contigs}
    fasta = [(c, "", genomes[c]) for c in contigs]

    asm = tmp_path / "asm.fasta"
    asm.write_text(synth.fasta_text(fasta))
    p1 = tmp_path / "r1.sam"
    p2 = tmp_path / "r2.sam"
    p1.write_text(sam1)
    p2.write_text(sam2)
    return fasta, sam1, sam2, asm, p1, p2


def _oracle_full(fasta, sam1, sam2):
    v1, v2, _, _, _ = oracle_filter(sam1, sam2)

    def tag(sam_text, verdicts):
        out_lines = []
        idx = 0
        for line in sam_text.splitlines():
            if line.startswith("@") or int(line.split("\t")[1]) & 4:
                out_lines.append(line)
                continue
            out_lines.append(line if verdicts[idx] else line + "\tZP:Z:fail")
            idx += 1
        return "\n".join(out_lines) + "\n"

    return oracle_polish(fasta, [tag(sam1, v1), tag(sam2, v2)])


@pytest.mark.parametrize("seed", [60, 61])
def test_full_pipeline_matches_oracle(tmp_path, seed):
    fasta, sam1, sam2, asm, p1, p2 = _make_paired_polish_case(tmp_path, seed)
    expected, _ = _oracle_full(fasta, sam1, sam2)

    out = io.StringIO()
    polish_paired(
        str(asm), str(p1), str(p2), out=out, backend="host",
        keep_filtered=str(tmp_path / "kept"),
    )
    got = {}
    name = None
    for line in out.getvalue().splitlines():
        if line.startswith(">"):
            name = line[1:].split()[0]
            got[name] = ""
        else:
            got[name] += line
    assert got == expected
    assert (tmp_path / "kept" / "filtered_1.sam").exists()


def test_full_cli(tmp_path, capsys):
    fasta, sam1, sam2, asm, p1, p2 = _make_paired_polish_case(tmp_path, 62)
    rc = main([
        "full", "--backend", "host", "--in1", str(p1), "--in2", str(p2),
        str(asm),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.startswith(">cA")
