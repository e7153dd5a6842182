"""Ports of the reference's misc.rs tests (misc.rs:218-305) plus
vectorised-equivalence checks."""

import gzip

import numpy as np
import pytest

from polypolish_tpu.errors import PolypolishError
from polypolish_tpu.io.fasta import load_fasta
from polypolish_tpu.utils.rounding import bankers_rounding, bankers_rounding_vec
from polypolish_tpu.utils.revcomp import reverse_complement
from polypolish_tpu.utils.timing import format_duration

FASTA_TEXT = ">seq_1 123 456\nACGAT\n>seq_2 abc\nGGTA\n>seq_3\nCTCGCATCAG\n"
EXPECTED = [
    ("seq_1", "123 456", "ACGAT"),
    ("seq_2", "abc", "GGTA"),
    ("seq_3", "", "CTCGCATCAG"),
]


def test_load_fasta_1(tmp_path):
    path = tmp_path / "test.fasta"
    path.write_text(FASTA_TEXT)
    assert load_fasta(path) == EXPECTED


def test_load_fasta_2(tmp_path):
    path = tmp_path / "test.fasta.gz"
    path.write_bytes(gzip.compress(FASTA_TEXT.encode()))
    assert load_fasta(path) == EXPECTED


def test_load_fasta_lowercase_and_wrapping(tmp_path):
    path = tmp_path / "t.fasta"
    path.write_text(">a\nacgt\nACGT\n")
    assert load_fasta(path) == [("a", "", "ACGTACGT")]


def test_load_fasta_errors(tmp_path):
    p = tmp_path / "x.fasta"
    p.write_text("")
    with pytest.raises(PolypolishError, match="too small"):
        load_fasta(p)
    p.write_text("ACGT\n")
    with pytest.raises(PolypolishError, match="not correctly formatted"):
        load_fasta(p)
    p.write_text(">a\nACGT\n>a\nACGT\n")
    with pytest.raises(PolypolishError, match="duplicated name"):
        load_fasta(p)
    p.write_text(">a\n>b\nACGT\n")
    with pytest.raises(PolypolishError, match="empty sequence"):
        load_fasta(p)
    # an empty name means the following sequence line sees no name yet,
    # matching the reference's "not correctly formatted" path
    p.write_text("> desc\nACGT\n")
    with pytest.raises(PolypolishError, match="not correctly formatted"):
        load_fasta(p)
    with pytest.raises(PolypolishError, match="does not exist|unable"):
        load_fasta(tmp_path / "missing.fasta")


def test_format_duration():
    assert format_duration(123.456789) == "0:02:03.456789"
    assert format_duration(3661.000001) == "1:01:01.000001"
    assert format_duration(360959.000001) == "100:15:59.000001"


def test_bankers_rounding():
    assert bankers_rounding(0.0) == 0
    assert bankers_rounding(123.0) == 123
    assert bankers_rounding(98765.0) == 98765

    assert bankers_rounding(0.4999) == 0
    assert bankers_rounding(0.5) == 0
    assert bankers_rounding(0.5001) == 1

    assert bankers_rounding(42.45) == 42
    assert bankers_rounding(42.5) == 42
    assert bankers_rounding(42.55) == 43

    assert bankers_rounding(12345.4998) == 12345
    assert bankers_rounding(12345.5) == 12346
    assert bankers_rounding(12345.5002) == 12346


def test_bankers_rounding_vec_matches_scalar():
    rng = np.random.default_rng(0)
    xs = np.concatenate(
        [
            rng.uniform(0, 1000, size=1000),
            np.arange(0, 50, 0.5),  # exact halves
            np.array([0.0, 0.5, 1.5, 2.5, 42.5, 43.5, 12345.5]),
        ]
    )
    vec = bankers_rounding_vec(xs)
    for x, v in zip(xs, vec):
        assert bankers_rounding(float(x)) == int(v), x


def test_reverse_complement():
    assert reverse_complement("GGTATCACTCAGGAAGC") == "GCTTCCTGAGTGATACC"
    assert reverse_complement("GGGGaaaaaaaatttatatat") == "atatataaattttttttCCCC"
    assert reverse_complement("atatataaattttttttCCCC") == "GGGGaaaaaaaatttatatat"
    assert reverse_complement("ACGT123") == "NNNACGT"


def test_reverse_complement_iupac():
    assert reverse_complement("RYSWKMBVDH") == "DHBVKMWSRY"
    assert reverse_complement(".-?") == "?-."
