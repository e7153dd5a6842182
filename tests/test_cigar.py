"""Ports of alignment.rs tests (alignment.rs:381-423) + CIGAR-engine edges."""

import pytest

from polypolish_tpu.errors import PolypolishError
from polypolish_tpu.io.sam import parse_alignment_full, parse_alignment_quick
from polypolish_tpu.ops.cigar import (
    InvalidCigar,
    expand_cigar,
    read_ranges_for_target_bases,
    trim_for_homopolymers,
)


def test_get_expanded_cigar_good():
    assert expand_cigar("10M") == "MMMMMMMMMM"
    assert expand_cigar("3M1I7M") == "MMMIMMMMMMM"
    assert expand_cigar("5M2D4M") == "MMMMMDDMMMM"
    assert expand_cigar("5=2X3=") == "=====XX==="
    assert expand_cigar("*") == ""


def test_get_expanded_cigar_bad():
    with pytest.raises(InvalidCigar):
        expand_cigar("10Q")  # 'Q' isn't a CIGAR operator
    with pytest.raises(InvalidCigar):
        expand_cigar("10MM1I10M")  # can't have consecutive letters
    with pytest.raises(InvalidCigar):
        expand_cigar("100M5")  # can't end on a number


def _aln(cigar: str, pos: int = 1000, seq: str = "ACTG"):
    line = f"r_1\t0\tx\t{pos}\t60\t{cigar}\t*\t0\t0\t{seq}\tKKKK\tNM:i:0"
    return parse_alignment_full(line)


def test_get_ref_positions():
    a = _aln("4M")
    assert a.ref_start == 999
    assert a.get_ref_end() == 1003

    a = _aln("2=1X1=")
    assert a.ref_start == 999
    assert a.get_ref_end() == 1003

    a = _aln("2M1I1M")
    assert a.ref_start == 999
    assert a.get_ref_end() == 1002

    a = _aln("2M1D1M")
    assert a.ref_start == 999
    assert a.get_ref_end() == 1003


def test_ref_start_zero_stays_zero():
    # ref_start is only decremented when > 0 (alignment.rs:59-61)
    line = "r\t0\tx\t0\t60\t4M\t*\t0\t0\tACTG\tKKKK\tNM:i:0"
    assert parse_alignment_full(line).ref_start == 0
    assert parse_alignment_quick(line).ref_start == 0


def test_read_ranges_basic():
    # M/=/X -> single base; I extends previous; D -> empty range
    assert read_ranges_for_target_bases("MMMM", 4, "r", "4M") == [
        (0, 1), (1, 2), (2, 3), (3, 4),
    ]
    assert read_ranges_for_target_bases("MMIM", 4, "r", "2M1I1M") == [
        (0, 1), (1, 3), (3, 4),
    ]
    assert read_ranges_for_target_bases("MMDM", 3, "r", "2M1D1M") == [
        (0, 1), (1, 2), (2, 2), (2, 3),
    ]


def test_read_ranges_errors():
    with pytest.raises(PolypolishError, match="BWA MEM"):
        read_ranges_for_target_bases("MMSM", 4, "r", "2M1S1M")
    with pytest.raises(PolypolishError, match="does not match read sequence"):
        read_ranges_for_target_bases("MMM", 4, "r", "3M")


def test_trim_for_homopolymers():
    # read GGTACC: final range is C; trailing C-run (2) popped + 1 more
    ranges = [(i, i + 1) for i in range(6)]
    trim_for_homopolymers(ranges, "GGTACC")
    assert ranges == [(0, 1), (1, 2), (2, 3)]

    # all ranges equal to the last base -> everything popped
    ranges = [(i, i + 1) for i in range(4)]
    trim_for_homopolymers(ranges, "AAAA")
    assert ranges == []

    # insertion range at the end differs from single-base run
    ranges = [(0, 1), (1, 2), (2, 4)]
    trim_for_homopolymers(ranges, "GGAG")
    assert ranges == [(0, 1)]


def test_missing_nm_tag():
    from polypolish_tpu.io.sam import MissingNmTag

    line = "r\t0\tx\t10\t60\t4M\t*\t0\t0\tACTG\tKKKK"
    with pytest.raises(MissingNmTag):
        parse_alignment_full(line)
    # unaligned reads don't need NM (flag 4)
    line = "r\t4\tx\t10\t60\t*\t*\t0\t0\tACTG\tKKKK"
    assert not parse_alignment_full(line).is_aligned()


def test_zp_fail_tag_case_insensitive():
    line = "r\t0\tx\t10\t60\t4M\t*\t0\t0\tACTG\tKKKK\tNM:i:0\tZP:Z:FAIL"
    assert not parse_alignment_full(line).pass_qc
    line = "r\t0\tx\t10\t60\t4M\t*\t0\t0\tACTG\tKKKK\tNM:i:0\tzp:z:fail"
    assert not parse_alignment_full(line).pass_qc
    line = "r\t0\tx\t10\t60\t4M\t*\t0\t0\tACTG\tKKKK\tNM:i:0"
    assert parse_alignment_full(line).pass_qc


def test_invalid_cigar_is_fatal():
    line = "r\t0\tx\t10\t60\t4Q\t*\t0\t0\tACTG\tKKKK\tNM:i:0"
    with pytest.raises(PolypolishError, match="invalid CIGAR"):
        parse_alignment_full(line)
