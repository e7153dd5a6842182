"""Adversarial fatal-path parity (VERDICT r4 item 4): for every fatal
input class, all three implementations — the framework's NATIVE packer,
the framework's pure-PYTHON packer, and the structure-for-structure
reference replica binary (ppref) — must agree on WHICH input dies and
die with the reference's exact message.

Reference message sites: alignment.rs:76-83 (missing NM),
alignment.rs:82-83 (invalid CIGAR), alignment.rs:190-198 (non-M/=/X/I/D
op reaching the target walk; CIGAR/read-length mismatch),
alignment.rs:269 (no alignments), alignment.rs:297-300 (unknown ref
name), alignment.rs:320 (no seq in group), misc.rs:56-75 (FASTA
checks), filter.rs:142 (empty filter input), filter.rs:169 (no unique
pairs), filter.rs:242-244 (undecidable orientation).

These cases harden the oracles against a shared misreading: the inputs
are chosen adversarially (S/H/N/P ops that *pass* the end-to-end QC
gate and reach the walk, boundary CIGAR/seq mismatches, IUPAC-heavy
survivors) so a semantic drift in any one implementation shows up as a
three-way disagreement.
"""

import io
import re
import subprocess

import pytest

import synth

from polypolish_tpu import log
from polypolish_tpu.errors import PolypolishError
from polypolish_tpu.native import loader, replica
from polypolish_tpu.pipeline.polish import polish

GENOME = "ACGT" * 50  # 200 bp


def _asm(tmp_path, body=None):
    asm = tmp_path / "asm.fasta"
    asm.write_text(body if body is not None else ">c1\n" + GENOME + "\n")
    return asm


def _run_framework(asm, sam, use_native):
    out = io.StringIO()
    with log.quiet():
        polish(None, 0.2, 0.5, 10, 5, False, str(asm), [str(sam)],
               out=out, use_native=use_native)
    return out.getvalue()


def _run_ppref(asm, sam):
    binary = replica.build()
    if binary is None:
        pytest.skip("ppref build failed")
    return subprocess.run([binary, "polish", str(asm), str(sam)],
                          capture_output=True, check=False)


# Each case: (id, sam_text, message_regex).  The regex is anchored on
# the reference's exact wording; {f} is replaced with the SAM path.
BWA_MEM = (r"unexpected character \(other than M, =, X, I or D\) in "
           r'CIGAR string for read r1: "{cig}" - did you use BWA MEM '
           r"to generate your alignments\?")

POLISH_FATALS = [
    ("missing_nm",
     "r1\t0\tc1\t5\t60\t4M\t*\t0\t0\tACGT\tKKKK\n",
     r'missing NM tag in "{f}" \(line 1\)'),
    ("missing_nm_line_no",
     "@HD\tVN:1.6\nr0\t0\tc1\t1\t60\t4M\t*\t0\t0\tACGT\tKKKK\tNM:i:0\n"
     "r1\t0\tc1\t5\t60\t4M\t*\t0\t0\tACGT\tKKKK\n",
     r'missing NM tag in "{f}" \(line 3\)'),
    ("cigar_bad_letter",
     "r1\t0\tc1\t5\t60\t3Q\t*\t0\t0\tACG\tKKK\tNM:i:0\n",
     r'encountered an invalid CIGAR string for read r1: "3Q"'),
    ("cigar_consecutive_letters",
     "r1\t0\tc1\t5\t60\t2MM\t*\t0\t0\tACG\tKKK\tNM:i:0\n",
     r'encountered an invalid CIGAR string for read r1: "2MM"'),
    ("cigar_trailing_number",
     "r1\t0\tc1\t5\t60\t3M3\t*\t0\t0\tACG\tKKK\tNM:i:0\n",
     r'encountered an invalid CIGAR string for read r1: "3M3"'),
    ("cigar_leading_letter",
     "r1\t0\tc1\t5\t60\tM3M\t*\t0\t0\tACGT\tKKKK\tNM:i:0\n",
     r'encountered an invalid CIGAR string for read r1: "M3M"'),
    ("cigar_consumes_more_than_read",
     "r1\t0\tc1\t5\t60\t5M\t*\t0\t0\tACGT\tKKKK\tNM:i:0\n",
     r"CIGAR string for read r1 does not match read sequence"),
    ("cigar_consumes_less_than_read",
     "r1\t0\tc1\t5\t60\t3M\t*\t0\t0\tACGT\tKKKK\tNM:i:0\n",
     r"CIGAR string for read r1 does not match read sequence"),
    # S/H/N/P ops that PASS the end-to-end QC gate (expanded CIGAR
    # starts and ends with M) and therefore reach the target walk
    ("walk_hits_S",
     "r1\t0\tc1\t5\t60\t2M2S2M\t*\t0\t0\tACGTAC\tKKKKKK\tNM:i:0\n",
     BWA_MEM.format(cig="2M2S2M")),
    ("walk_hits_N",
     "r1\t0\tc1\t5\t60\t2M2N2M\t*\t0\t0\tACGT\tKKKK\tNM:i:0\n",
     BWA_MEM.format(cig="2M2N2M")),
    ("walk_hits_H",
     "r1\t0\tc1\t5\t60\t2M1H2M\t*\t0\t0\tACGT\tKKKK\tNM:i:0\n",
     BWA_MEM.format(cig="2M1H2M")),
    ("walk_hits_P",
     "r1\t0\tc1\t5\t60\t2M1P2M\t*\t0\t0\tACGT\tKKKK\tNM:i:0\n",
     BWA_MEM.format(cig="2M1P2M")),
    ("unknown_ref_name",
     "r1\t0\tnope\t5\t60\t4M\t*\t0\t0\tACGT\tKKKK\tNM:i:0\n",
     r"query name nope in SAM but not in assembly"),
    # NOTE: the actual Rust reference PANICS here (unwrap on None at
    # alignment.rs:318-320, reached via the empty final group at
    # alignment.rs:265) before its own "no alignments in" check
    # (alignment.rs:268-270 — dead code in the reference).  The
    # framework and ppref both implement the intended clean fatal.
    ("headers_only",
     "@HD\tVN:1.6\n@SQ\tSN:c1\tLN:200\n",
     r'no alignments in "{f}"'),
    ("only_unaligned_records",
     "r1\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tKKKK\n",
     r'no alignments in "{f}"'),
    ("group_all_star_seqs",
     "r1\t256\tc1\t5\t60\t4M\t*\t0\t0\t*\t*\tNM:i:0\n"
     "r1\t256\tc1\t9\t60\t4M\t*\t0\t0\t*\t*\tNM:i:0\n",
     r"no alignments for read r1 contain sequence"),
    ("too_few_columns",
     "@HD\tVN:1.6\nr1\t0\tc1\t5\n",
     r'too few columns in "{f}" \(line 2\)'),
]


@pytest.mark.parametrize(
    "sam_text,msg", [(s, m) for _, s, m in POLISH_FATALS],
    ids=[c[0] for c in POLISH_FATALS])
def test_polish_fatal_three_way(tmp_path, sam_text, msg):
    asm = _asm(tmp_path)
    sam = tmp_path / "x.sam"
    sam.write_text(sam_text)
    pattern = msg.replace("{f}", re.escape(str(sam)))

    # 1) framework, pure-Python packer
    with pytest.raises(PolypolishError, match=pattern):
        _run_framework(asm, sam, use_native=False)
    # 2) framework, native packer
    if loader.available():
        with pytest.raises(PolypolishError, match=pattern):
            _run_framework(asm, sam, use_native=True)
    # 3) reference replica binary
    proc = _run_ppref(asm, sam)
    assert proc.returncode == 1, proc.stderr.decode()
    stderr = proc.stderr.decode("utf-8", "replace")
    assert re.search(pattern, stderr), (
        f"ppref stderr does not carry the reference message:\n{stderr}")


FASTA_FATALS = [
    ("duplicated_name",
     ">c1\nACGTACGT\n>c1\nACGTACGT\n",
     r'"{f}" has a duplicated name'),
    ("empty_sequence",
     ">c1\nACGTACGT\n>c2\n",
     r'"{f}" has an empty sequence'),
    # '>' with no name: the reference dies at the FIRST sequence line
    # ("is not correctly formatted", misc.rs:123) — its "unnamed
    # sequence" check (misc.rs:62) is unreachable for parseable files
    # because records are only pushed when name.len() > 0
    ("header_without_name",
     ">\nACGTACGT\n",
     r'"{f}" is not correctly formatted'),
    ("sequence_before_header",
     "ACGTACGT\n>c1\nACGT\n",
     r'"{f}" is not correctly formatted'),
    # an empty FILE dies earlier, in the gzip sniff (misc.rs:95)
    ("empty_file",
     "",
     r'"{f}" is too small'),
    # >=2 bytes but zero records (blank lines only, misc.rs:58)
    ("no_sequences",
     "\n\n\n",
     r'"{f}" contains no sequences'),
]


@pytest.mark.parametrize(
    "body,msg", [(b, m) for _, b, m in FASTA_FATALS],
    ids=[c[0] for c in FASTA_FATALS])
def test_fasta_fatal_three_way(tmp_path, body, msg):
    asm = _asm(tmp_path, body)
    sam = tmp_path / "x.sam"
    sam.write_text("r1\t0\tc1\t1\t60\t4M\t*\t0\t0\tACGT\tKKKK\tNM:i:0\n")
    pattern = msg.replace("{f}", re.escape(str(asm)))

    for use_native in (False, True):
        if use_native and not loader.available():
            continue
        with pytest.raises(PolypolishError, match=pattern):
            _run_framework(asm, sam, use_native=use_native)
    proc = _run_ppref(asm, sam)
    assert proc.returncode == 1
    assert re.search(pattern, proc.stderr.decode("utf-8", "replace"))


def _filter_three_way(tmp_path, lines1, lines2, pattern,
                      orientation="auto"):
    from polypolish_tpu.pipeline.filtering import filter_pairs

    in1, in2 = tmp_path / "i1.sam", tmp_path / "i2.sam"
    in1.write_text("\n".join(lines1) + "\n")
    in2.write_text("\n".join(lines2) + "\n")
    pattern = pattern.replace("{f}", re.escape(str(in1)))
    with log.quiet(), pytest.raises(PolypolishError, match=pattern):
        filter_pairs(str(in1), str(in2), str(tmp_path / "o1.sam"),
                     str(tmp_path / "o2.sam"), orientation)
    binary = replica.build()
    if binary is None:
        pytest.skip("ppref build failed")
    proc = subprocess.run(
        [binary, "filter", "--in1", str(in1), "--in2", str(in2),
         "--out1", str(tmp_path / "r1.sam"),
         "--out2", str(tmp_path / "r2.sam"),
         "--orientation", orientation],
        capture_output=True, check=False)
    assert proc.returncode == 1
    assert re.search(pattern, proc.stderr.decode("utf-8", "replace"))


def test_filter_undecidable_orientation_three_way(tmp_path):
    """A dead tie between two orientations (filter.rs:242-244)."""
    def aln(name, flag, pos):
        return (f"{name}\t{flag}\tc1\t{pos}\t60\t4M\t*\t0\t0\tACGT\tKKKK"
                "\tNM:i:0")

    lines1, lines2 = ["@HD\tVN:1.6"], ["@HD\tVN:1.6"]
    # two fr pairs and two rf pairs -> argmax is not unique
    for i, (f1, f2) in enumerate([(0, 16), (0, 16), (16, 0), (16, 0)]):
        lines1.append(aln(f"p{i}", f1, 10))
        lines2.append(aln(f"p{i}", f2, 100))
    _filter_three_way(
        tmp_path, lines1, lines2,
        r"could not automatically determine read pair orientation")


def test_filter_empty_input_three_way(tmp_path):
    _filter_three_way(
        tmp_path,
        ["@HD\tonly headers"],
        ["r1_x\t0\tc1\t5\t60\t4M\t*\t0\t0\tACGT\tKKKK\tNM:i:0"],
        r'no alignments found in "{f}"')


def test_filter_no_unique_pairs_three_way(tmp_path):
    def aln(name, pos):
        return (f"{name}\t0\tc1\t{pos}\t60\t4M\t*\t0\t0\tACGT\tKKKK"
                "\tNM:i:0")

    lines1, lines2 = ["@HD\tVN:1.6"], ["@HD\tVN:1.6"]
    for i in range(4):
        lines1 += [aln(f"p{i}", 10), aln(f"p{i}", 50)]  # multi-mapped
        lines2.append(aln(f"p{i}", 100))
    _filter_three_way(
        tmp_path, lines1, lines2,
        r"no one-alignment-per-read pairs available to determine "
        r"orientation and insert size thresholds")


# ------------------------------------------------------------------
# Survivors: adversarial inputs that must NOT die, with byte-identical
# output across all three implementations.
# ------------------------------------------------------------------

SURVIVORS = [
    # missing NM on an UNALIGNED read is fine (alignment.rs:76 gates on
    # flag&4==0)
    ("missing_nm_unaligned",
     "r0\t0\tc1\t1\t60\t8M\t*\t0\t0\tACGTACGT\tKKKKKKKK\tNM:i:0\n"
     "r1\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\tKKKK\n"),
    # S at the CIGAR *end* fails the end-to-end gate -> silently
    # discarded, never reaches the walk
    ("soft_clip_discarded",
     "r0\t0\tc1\t1\t60\t8M\t*\t0\t0\tACGTACGT\tKKKKKKKK\tNM:i:0\n"
     "r1\t0\tc1\t5\t60\t4M2S\t*\t0\t0\tACGTAC\tKKKKKK\tNM:i:0\n"),
    # IUPAC-heavy read: ambiguity codes are legal pileup seqs
    ("iupac_heavy",
     "r0\t0\tc1\t1\t60\t8M\t*\t0\t0\tRYSWKMBN\tKKKKKKKK\tNM:i:8\n"
     "r1\t16\tc1\t9\t60\t8M\t*\t0\t0\tNNKMWSYR\tKKKKKKKK\tNM:i:8\n"),
    # ZP:Z:FAIL is case-insensitive (alignment.rs:72-74): read is
    # parsed but QC-failed, leaving r0 as the only contributor
    ("zp_fail_uppercase",
     "r0\t0\tc1\t1\t60\t8M\t*\t0\t0\tACGTACGT\tKKKKKKKK\tNM:i:0\n"
     "r1\t0\tc1\t9\t60\t4M\t*\t0\t0\tACGT\tKKKK\tNM:i:0\tZP:Z:FAIL\n"),
]


@pytest.mark.parametrize(
    "sam_text", [s for _, s in SURVIVORS],
    ids=[c[0] for c in SURVIVORS])
def test_survivors_three_way_identical(tmp_path, sam_text):
    asm = _asm(tmp_path)
    sam = tmp_path / "x.sam"
    sam.write_text(sam_text)

    fasta_py = _run_framework(asm, sam, use_native=False)
    if loader.available():
        assert _run_framework(asm, sam, use_native=True) == fasta_py
    proc = _run_ppref(asm, sam)
    assert proc.returncode == 0, proc.stderr.decode()
    assert proc.stdout.decode() == fasta_py


def test_empty_line_asymmetry_polish_vs_filter(tmp_path):
    """The reference SKIPS empty lines in polish (alignment.rs:241) but
    DIES on them in filter (filter.rs has no empty-line guard, so
    new_quick reports too-few-columns).  Pin the asymmetry three-way."""
    from polypolish_tpu.pipeline.filtering import filter_pairs

    asm = _asm(tmp_path)
    sam_text = ("r1\t0\tc1\t1\t60\t8M\t*\t0\t0\tACGTACGT\tKKKKKKKK"
                "\tNM:i:0\n\n"
                "r2\t0\tc1\t9\t60\t8M\t*\t0\t0\tACGTACGT\tKKKKKKKK"
                "\tNM:i:0\n")
    sam = tmp_path / "x.sam"
    sam.write_text(sam_text)

    # polish: empty line skipped on all three implementations
    fasta_py = _run_framework(asm, sam, use_native=False)
    if loader.available():
        assert _run_framework(asm, sam, use_native=True) == fasta_py
    proc = _run_ppref(asm, sam)
    assert proc.returncode == 0
    assert proc.stdout.decode() == fasta_py

    # filter: the empty line is a too-few-columns fatal (line 2)
    pattern = (r'too few columns in "' + re.escape(str(sam))
               + r'" \(line 2\)')
    with log.quiet(), pytest.raises(PolypolishError, match=pattern):
        filter_pairs(str(sam), str(sam) + "2", str(tmp_path / "o1.sam"),
                     str(tmp_path / "o2.sam"))
    binary = replica.build()
    if binary is not None:
        (tmp_path / "y.sam").write_text(sam_text)
        proc = subprocess.run(
            [binary, "filter", "--in1", str(sam),
             "--in2", str(tmp_path / "y.sam"),
             "--out1", str(tmp_path / "r1.sam"),
             "--out2", str(tmp_path / "r2.sam")],
            capture_output=True, check=False)
        assert proc.returncode == 1
        assert re.search(pattern, proc.stderr.decode("utf-8", "replace"))
