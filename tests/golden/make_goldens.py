"""Golden-case generator with hand-derived assertions.

Each case below hand-writes a tiny FASTA+SAM targeting one reference
rule, states the HAND-DERIVED expectation for the targeted TSV/FASTA
lines as `checks`, freezes the full expected output produced by the
independent replica binary (ppref), and FAILS if the hand derivation
disagrees with it — a frozen file can therefore never silently encode
a shared misreading of the rule it targets.

Run:  python tests/golden/make_goldens.py   (regenerates *.expected.*)

Rules targeted (VERDICT round-1 list):
  A  banker's .5 ties from fractional 1/k weights      misc.rs:204-215
  B  valid-threshold .5 tie flips kept/multiple        pileup.rs:70,111-129
  C  homopolymer trim consuming an entire alignment    alignment.rs:364-378
  D  multi-base insertion + deletion adopted           pileup.rs:101-109, polish.rs:188
  E  ZP:Z:fail case-insensitivity + near-miss tags     alignment.rs:72-74
  F  NM == max_errors boundary                         alignment.rs:284
  G  --careful drops multi-mapped reads                alignment.rs:277-279
  H  1/3-weight f64 accumulation + %.1f depth print    alignment.rs:288, pileup.rs:64
  I  '-' characters in the assembly itself stripped    polish.rs:188
  J  multi-contig, descriptions, zero-coverage contig  polish.rs:93-106,196-203
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

HDR = "@HD\tVN:1.6\tSO:unsorted\n"


def sq(name, ln):
    return f"@SQ\tSN:{name}\tLN:{ln}\n"


def aln(name, flags, ref, pos1, cigar, seq, nm=0, extra=""):
    """One SAM body line (pos1 is 1-based like SAM)."""
    qual = "I" * (len(seq) if seq != "*" else 1)
    tag = f"\tNM:i:{nm}" if nm is not None else ""
    return (f"{name}\t{flags}\t{ref}\t{pos1}\t60\t{cigar}\t*\t0\t0"
            f"\t{seq}\t{qual}{tag}{extra}\n")


CASES = {}


def case(name, fasta, sam, params=None, checks=()):
    CASES[name] = {
        "fasta": fasta, "sam": sam, "params": params or {},
        "checks": list(checks),
    }


# ---------------------------------------------------------------------
# A: banker's rounding ties from 1/2 weights.
#    5 reads with k=2 alignments put depth 2.5 on pos 2..5 (primaries at
#    s=2, len 5 -> trim drops the last target, votes at 2..5);
#    invalid = bankers(2.5*0.2 = 0.5) = 0  (round-half-to-EVEN; a
#    half-up implementation would print 1); valid = max(5, bankers(1.25)
#    = 1) = 5; depth 2.5 < 5 -> low_depth.
#    25 such reads put depth 12.5 on pos 10..13: invalid = bankers(2.5)
#    = 2 (half-up: 3); valid = max(5, bankers(6.25) = 6) = 6; all 25
#    vote the draft base -> single valid -> kept.
# ---------------------------------------------------------------------
_A_DRAFT = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"  # 40 bp
_a_sam = HDR + sq("c", 40)
for i in range(5):
    seq = _A_DRAFT[2:7]
    _a_sam += aln(f"a{i}", 0, "c", 3, "5M", seq, 0)           # primary s=2
    _a_sam += aln(f"a{i}", 256, "c", 21, "5M", "*", 0)        # k=2 -> w=0.5
for i in range(25):
    seq = _A_DRAFT[10:15]
    _a_sam += aln(f"b{i}", 0, "c", 11, "5M", seq, 0)          # s=10
    _a_sam += aln(f"b{i}", 256, "c", 31, "5M", "*", 0)
case(
    "bankers_ties", f">c\n{_A_DRAFT}\n", _a_sam,
    checks=[
        ("tsv", 2, {"depth": "2.5", "invalid": "0", "valid": "5",
                    "status": "low_depth"}),
        ("tsv", 10, {"depth": "12.5", "invalid": "2", "valid": "6",
                     "status": "kept"}),
    ],
)

# ---------------------------------------------------------------------
# B: valid-threshold .5 tie.  13 unique reads (w=1) cover pos 2..5;
#    at pos 4 six vote G and seven vote A while the draft has C.
#    depth 13.0: valid = max(5, bankers(6.5) = 6) = 6 (half-up: 7);
#    G(6) >= 6 AND A(7) >= 6 -> TWO valid -> multiple -> C kept.
#    (Half-up valid=7 would adopt A -> FASTA would differ.)
# ---------------------------------------------------------------------
_B_DRAFT = "AAGTCCGTTT"
_b_sam = HDR + sq("c", 10)
for i in range(13):
    base = "G" if i < 6 else "A"
    seq = _B_DRAFT[2:4] + base + _B_DRAFT[5:7]  # covers 2..6, len 5
    _b_sam += aln(f"r{i:02d}", 0, "c", 3, "5M", seq, 1)
case(
    "valid_tie", f">c\n{_B_DRAFT}\n", _b_sam,
    checks=[
        ("tsv", 4, {"depth": "13.0", "invalid": "3", "valid": "6",
                    "pileup": "Ax7,Gx6", "status": "multiple",
                    "new_base": "C"}),
        ("fasta_contains", "AAGTC"),
    ],
)

# ---------------------------------------------------------------------
# C: homopolymer trim.  Draft has AAAA at 4..7.
#    read TAAAA (5M at s=3): last range = "A"; pops the four A's, then
#    "T" != "A" stops, then ONE more pop -> empty -> ZERO votes.
#    read GTAAA (5M at s=2): pops three A's, stops at "T", pops the T
#    -> only [G] remains -> exactly one vote G@2.
#    So the TSV shows Gx1 at pos 2 and NO other votes anywhere.
# ---------------------------------------------------------------------
_C_DRAFT = "ACGTAAAATCGATCGA"
_c_sam = HDR + sq("c", 16)
_c_sam += aln("t1", 0, "c", 4, "5M", "TAAAA", 0)
_c_sam += aln("t2", 0, "c", 3, "5M", "GTAAA", 0)
case(
    "homopolymer_trim", f">c\n{_C_DRAFT}\n", _c_sam,
    checks=[
        ("tsv", 2, {"depth": "1.0", "pileup": "Gx1"}),
        ("tsv", 3, {"depth": "0.0", "pileup": ""}),
        ("tsv", 4, {"depth": "0.0", "pileup": ""}),
    ],
)

# ---------------------------------------------------------------------
# D: insertion + deletion adopted.  20 bp draft "ACGTACGT..." (pos 5 =
#    'C', pos 12 = 'A').
#    7 reads 4M1I4M at s=2: the I op EXTENDS the previous target's
#    range (alignment.rs:182-184), so target pos 5's range covers read
#    bases "CG"; trim pops targets 9 then 8 -> votes at 2..7 with
#    "CG"x7 at pos 5.  depth 7: valid = max(5, bankers(3.5) = 4) = 5
#    (3.5 rounds to the EVEN 4); CGx7 >= 5 valid; invalid =
#    bankers(1.4) = 1; dense counts 0 < 1 -> no intermediates ->
#    CHANGED to "CG" (the polished FASTA gains a G after pos 5).
#    7 reads 3M1D3M at s=9: M@9,10,11, D@12 (zero-length range -> '-'),
#    M@13,14,15; trim pops 15 then 14 -> votes at 9..13; '-'x7 at 12 ->
#    CHANGED to deletion (pos 12 'A' removed).
#    Hand-built FASTA: "ACGTA"+"CG"+"GTACGT"+"CGTACGT" (len 20).
# ---------------------------------------------------------------------
_D_DRAFT = "ACGTACGTACGTACGTACGT"
_d_sam = HDR + sq("c", 20)
for i in range(7):
    seq = _D_DRAFT[2:6] + "G" + _D_DRAFT[6:10]  # 4M 1I 4M, len 9
    _d_sam += aln(f"i{i}", 0, "c", 3, "4M1I4M", seq, 1)
for i in range(7):
    seq = _D_DRAFT[9:12] + _D_DRAFT[13:16]  # 3M 1D 3M, len 6
    _d_sam += aln(f"d{i}", 0, "c", 10, "3M1D3M", seq, 1)
case(
    "indel_adopted", f">c\n{_D_DRAFT}\n", _d_sam,
    checks=[
        ("tsv", 5, {"status": "changed", "new_base": "CG",
                    "pileup": "CGx7"}),
        ("tsv", 12, {"status": "changed", "new_base": "-",
                     "pileup": "-x7"}),
        ("fasta_seq", "ACGTACGGTACGTCGTACGT"),
    ],
)

# ---------------------------------------------------------------------
# E: ZP tag handling.  6 reads over the same 5 bp window; four carry
#    case variants of ZP:Z:fail (all must fail QC: eq_ignore_ascii_case)
#    and two pass (an 11-char near-miss tag and no tag).  Only the two
#    passing reads vote -> depth 2.0.
# ---------------------------------------------------------------------
_E_DRAFT = "ACGTACGTAC"
_e_sam = HDR + sq("c", 10)
_e_seq = _E_DRAFT[2:7]
for i, tag in enumerate(["\tZP:Z:fail", "\tZP:Z:FAIL", "\tzp:z:FaIl",
                         "\tZp:Z:fAiL"]):
    _e_sam += aln(f"f{i}", 0, "c", 3, "5M", _e_seq, 0, extra=tag)
_e_sam += aln("p0", 0, "c", 3, "5M", _e_seq, 0, extra="\tZP:Z:failure")
_e_sam += aln("p1", 0, "c", 3, "5M", _e_seq, 0)
case(
    "zp_case_variants", f">c\n{_E_DRAFT}\n", _e_sam,
    checks=[("tsv", 2, {"depth": "2.0"})],
)

# ---------------------------------------------------------------------
# F: NM boundary at --max_errors 10 (default): NM:i:10 kept,
#    NM:i:11 discarded -> depth 1.0 in the window.
# ---------------------------------------------------------------------
_f_sam = HDR + sq("c", 10)
_f_sam += aln("k", 0, "c", 3, "5M", _e_seq, 10)
_f_sam += aln("x", 0, "c", 3, "5M", _e_seq, 11)
case(
    "nm_boundary", f">c\n{_E_DRAFT}\n", _f_sam,
    checks=[("tsv", 2, {"depth": "1.0"})],
)

# ---------------------------------------------------------------------
# G: --careful drops any read with more than one alignment (counted
#    BEFORE QC): the k=2 read contributes nothing, the unique read
#    votes with w=1 -> depth 1.0 (without --careful it would be 2.0 at
#    the primary window).
# ---------------------------------------------------------------------
_g_sam = HDR + sq("c", 10)
_g_sam += aln("m", 0, "c", 3, "5M", _e_seq, 0)
_g_sam += aln("m", 256, "c", 3, "5M", "*", 0)
_g_sam += aln("u", 0, "c", 3, "5M", _e_seq, 0)
case(
    "careful_mode", f">c\n{_E_DRAFT}\n", _g_sam,
    params={"careful": True},
    checks=[("tsv", 2, {"depth": "1.0"})],
)

# ---------------------------------------------------------------------
# H: w = 1/3 f64 accumulation.  One read with 3 alignments ALL at the
#    same window: depth at covered positions = 1/3+1/3+1/3 =
#    0.9999999999999998... which %.1f-prints as "1.0" — pins both the
#    weight arithmetic and the print path.  Plus 5 independent k=3
#    reads at another window -> depth 5/3 = 1.666... -> "1.7".
# ---------------------------------------------------------------------
_H_DRAFT = "ACGTACGTACGTACGTACGT"
_h_sam = HDR + sq("c", 20)
_h_seq1 = _H_DRAFT[2:7]
_h_sam += aln("w", 0, "c", 3, "5M", _h_seq1, 0)
_h_sam += aln("w", 256, "c", 3, "5M", "*", 0)
_h_sam += aln("w", 256, "c", 3, "5M", "*", 0)
for i in range(5):
    seq = _H_DRAFT[10:15]
    _h_sam += aln(f"v{i}", 0, "c", 11, "5M", seq, 0)
    _h_sam += aln(f"v{i}", 256, "c", 16, "5M", "*", 0)
    _h_sam += aln(f"v{i}", 256, "c", 11, "5M", "*", 0)
case(
    "third_weights", f">c\n{_H_DRAFT}\n", _h_sam,
    checks=[
        ("tsv", 2, {"depth": "1.0", "pileup": "Gx3"}),
    ],
)

# ---------------------------------------------------------------------
# I: '-' characters inside the ASSEMBLY itself are stripped from the
#    polished output by the final replace (polish.rs:188), and
#    lowercase assembly letters are uppercased at load (misc.rs:114).
# ---------------------------------------------------------------------
case(
    "dash_in_assembly", ">c\nacgt-acgta\n", HDR + sq("c", 10) +
    aln("r", 0, "c", 1, "4M", "ACGT", 0),
    checks=[("fasta_seq", "ACGTACGTA")],
)

# ---------------------------------------------------------------------
# J: multi-contig with descriptions; second contig has zero coverage
#    (all low_depth, emitted verbatim with the ' polypolish' suffix
#    after the description).
# ---------------------------------------------------------------------
case(
    "multi_contig",
    ">one first contig\nACGTACGTAC\n>two uncovered contig\nTTTTTGGGGG\n",
    HDR + sq("one", 10) + sq("two", 10) +
    aln("r0", 0, "one", 3, "5M", "GTACG", 0) +
    aln("r1", 0, "one", 3, "5M", "GTACG", 0),
    checks=[
        ("fasta_contains", ">one first contig polypolish"),
        ("fasta_contains", ">two uncovered contig polypolish"),
        ("fasta_contains", "TTTTTGGGGG"),
    ],
)


# ---------------------------------------------------------------------


def tsv_row(tsv_text, contig_pos):
    for line in tsv_text.splitlines()[1:]:
        f = line.split("\t")
        if int(f[1]) == contig_pos:
            return {"name": f[0], "pos": f[1], "base": f[2],
                    "depth": f[3], "invalid": f[4], "valid": f[5],
                    "pileup": f[6], "status": f[7], "new_base": f[8]}
    raise AssertionError(f"pos {contig_pos} not in TSV")


def run_case(name, spec):
    from polypolish_tpu.native import replica

    fasta_p = os.path.join(HERE, f"{name}.fasta")
    sam_p = os.path.join(HERE, f"{name}.sam")
    with open(fasta_p, "w") as f:
        f.write(spec["fasta"])
    with open(sam_p, "w") as f:
        f.write(spec["sam"])
    dbg = os.path.join(HERE, f"{name}.expected.tsv")
    proc = replica.run_polish(fasta_p, [sam_p], debug=dbg,
                              **spec["params"])
    assert proc.returncode == 0, (name, proc.stderr.decode())
    with open(os.path.join(HERE, f"{name}.expected.fasta"), "wb") as f:
        f.write(proc.stdout)

    fasta_text = proc.stdout.decode()
    tsv_text = open(dbg).read()
    for chk in spec["checks"]:
        if chk[0] == "tsv":
            _, pos, expect = chk
            row = tsv_row(tsv_text, pos)
            for col, val in expect.items():
                assert row[col] == val, (
                    f"{name}: pos {pos} col {col}: hand-derived {val!r} "
                    f"!= replica {row[col]!r}"
                )
        elif chk[0] == "fasta_seq":
            seq = fasta_text.splitlines()[1]
            assert seq == chk[1], (name, seq, chk[1])
        elif chk[0] == "fasta_contains":
            assert chk[1] in fasta_text, (name, chk[1])
    print(f"  {name}: OK ({len(spec['checks'])} hand checks)")


def main():
    for name, spec in CASES.items():
        run_case(name, spec)
    print(f"{len(CASES)} golden cases regenerated + hand-verified")


if __name__ == "__main__":
    main()
