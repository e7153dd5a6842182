"""Fatal-error parity for the Python packer + filter workflows
(reference messages: alignment.rs / filter.rs / polish.rs)."""

import pytest

import synth

from polypolish_tpu.errors import PolypolishError
from polypolish_tpu.io.fasta import load_fasta
from polypolish_tpu.ops import pack
from polypolish_tpu.pipeline.filtering import filter_pairs
from polypolish_tpu.vocab import Vocab


@pytest.fixture
def tiny_assembly(tmp_path):
    asm = tmp_path / "a.fasta"
    asm.write_text(">c1\n" + "ACGT" * 50 + "\n")
    return asm


def _process(sam_path, asm):
    fa = load_fasta(asm)
    votes = pack.new_votes_from_fasta(fa)
    return pack.process_sam(str(sam_path), votes, Vocab(), 10, False)


def test_python_packer_errors(tmp_path, tiny_assembly):
    sam = tmp_path / "x.sam"

    sam.write_text("r\t0\tc1\t10\t60\t4M\t*\t0\t0\tACTG\tKKKK\n")
    with pytest.raises(PolypolishError, match=r"missing NM tag .*\(line 1\)"):
        _process(sam, tiny_assembly)

    sam.write_text("@HD\tx\nbadline\n")
    with pytest.raises(PolypolishError, match=r"too few columns .*\(line 2\)"):
        _process(sam, tiny_assembly)

    sam.write_text("r\t0\tc1\t10\t60\t3Q\t*\t0\t0\tACT\tKKK\tNM:i:0\n")
    with pytest.raises(PolypolishError, match='invalid CIGAR string for read r: "3Q"'):
        _process(sam, tiny_assembly)

    sam.write_text("r\t0\tnope\t10\t60\t4M\t*\t0\t0\tACTG\tKKKK\tNM:i:0\n")
    with pytest.raises(
        PolypolishError, match="query name nope in SAM but not in assembly"
    ):
        _process(sam, tiny_assembly)

    sam.write_text("@HD\tonly headers\n")
    with pytest.raises(PolypolishError, match="no alignments in"):
        _process(sam, tiny_assembly)

    # a group whose alignments all have '*' sequences
    sam.write_text(
        "r\t256\tc1\t10\t60\t4M\t*\t0\t0\t*\t*\tNM:i:0\n"
        "r\t256\tc1\t20\t60\t4M\t*\t0\t0\t*\t*\tNM:i:0\n"
    )
    with pytest.raises(
        PolypolishError, match="no alignments for read r contain sequence"
    ):
        _process(sam, tiny_assembly)

    # CIGAR consuming more read bases than the sequence has
    sam.write_text("r\t0\tc1\t10\t60\t5M\t*\t0\t0\tACTG\tKKKK\tNM:i:0\n")
    with pytest.raises(
        PolypolishError, match="CIGAR string for read r does not match"
    ):
        _process(sam, tiny_assembly)

    # alignment running past the contig end
    sam.write_text(
        "r\t0\tc1\t195\t60\t10M\t*\t0\t0\tACGTACGTAC\tKKKKKKKKKK\tNM:i:0\n"
    )
    with pytest.raises(PolypolishError, match="extends past the end"):
        _process(sam, tiny_assembly)


def test_filter_no_unique_pairs(tmp_path):
    # every read is multi-mapped -> no one-alignment-per-read pairs
    lines1, lines2 = ["@HD\tx"], ["@HD\tx"]
    for i in range(5):
        for p in (10, 50):
            lines1.append(
                f"r{i}\t0\tc\t{p}\t60\t4M\t*\t0\t0\tACGT\tKKKK\tNM:i:0"
            )
            lines2.append(
                f"r{i}\t16\tc\t{p + 100}\t60\t4M\t*\t0\t0\tACGT\tKKKK\tNM:i:0"
            )
    in1, in2 = tmp_path / "i1.sam", tmp_path / "i2.sam"
    in1.write_text("\n".join(lines1) + "\n")
    in2.write_text("\n".join(lines2) + "\n")
    with pytest.raises(
        PolypolishError, match="no one-alignment-per-read pairs available"
    ):
        filter_pairs(
            str(in1), str(in2), str(tmp_path / "o1"), str(tmp_path / "o2")
        )


def test_filter_empty_first_file(tmp_path):
    in1, in2 = tmp_path / "i1.sam", tmp_path / "i2.sam"
    in1.write_text("@HD\tonly headers\n")
    in2.write_text("r\t0\tc\t10\t60\t4M\t*\t0\t0\tACGT\tKKKK\tNM:i:0\n")
    with pytest.raises(PolypolishError, match="no alignments found"):
        filter_pairs(
            str(in1), str(in2), str(tmp_path / "o1"), str(tmp_path / "o2")
        )
