"""Differential validation: framework vs the reference-replica binary.

VERDICT.md round 1 flagged that every parity gate compared against
tests/oracle.py, written from the same SURVEY reading.  ppref
(native/ref_replica.cc) is a second, structurally different
implementation written directly against the Rust source's observable
behavior (per-function citations in the .cc) — byte-identical FASTA and
--debug TSV across framework backends AND ppref catches shared
misreadings the oracle alone cannot.
"""

import io
import subprocess

import numpy as np
import pytest

import synth

from polypolish_tpu import log
from polypolish_tpu.native import replica
from polypolish_tpu.pipeline.polish import polish

pytestmark = pytest.mark.skipif(
    replica.build() is None, reason="ppref build unavailable"
)


def _framework_polish(tmp_path, asm, sams, tag, **kw):
    out = io.StringIO()
    dbg = str(tmp_path / f"fw_{tag}.tsv")
    with log.quiet():
        polish(dbg, kw.get("fraction_invalid", 0.2),
               kw.get("fraction_valid", 0.5), kw.get("max_errors", 10),
               kw.get("min_depth", 5), kw.get("careful", False),
               str(asm), [str(s) for s in sams], out=out, backend="host")
    return out.getvalue().encode(), open(dbg, "rb").read()


def _replica_polish(tmp_path, asm, sams, tag, **kw):
    dbg = str(tmp_path / f"ref_{tag}.tsv")
    proc = replica.run_polish(str(asm), [str(s) for s in sams], debug=dbg,
                              **kw)
    assert proc.returncode == 0, proc.stderr.decode()
    return proc.stdout, open(dbg, "rb").read()


def _write_case(tmp_path, seed, **case_kw):
    fasta, sam_text = synth.make_polish_case(seed=seed, **case_kw)
    asm = tmp_path / f"asm_{seed}.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / f"aln_{seed}.sam"
    sam.write_text(sam_text)
    return asm, sam


@pytest.mark.parametrize("seed", range(6))
def test_polish_matches_replica(tmp_path, seed):
    asm, sam = _write_case(
        tmp_path, seed, genome_len=800, n_reads=500, read_len=50,
        err=0.06, multi_frac=0.3,
    )
    fw_fa, fw_tsv = _framework_polish(tmp_path, asm, [sam], seed)
    rp_fa, rp_tsv = _replica_polish(tmp_path, asm, [sam], seed)
    assert fw_fa == rp_fa
    assert fw_tsv == rp_tsv


@pytest.mark.parametrize("careful", [False, True])
def test_polish_matches_replica_params(tmp_path, careful):
    asm, sam = _write_case(
        tmp_path, 42, genome_len=600, n_reads=400, read_len=40,
        err=0.08, multi_frac=0.4,
    )
    kw = dict(fraction_invalid=0.3, fraction_valid=0.6, max_errors=4,
              min_depth=2, careful=careful)
    fw_fa, fw_tsv = _framework_polish(tmp_path, asm, [sam],
                                      f"c{careful}", **kw)
    rp_fa, rp_tsv = _replica_polish(tmp_path, asm, [sam],
                                    f"c{careful}", **kw)
    assert fw_fa == rp_fa
    assert fw_tsv == rp_tsv


def test_polish_matches_replica_two_sams(tmp_path):
    asm, sam1 = _write_case(
        tmp_path, 7, genome_len=700, n_reads=300, read_len=45,
        err=0.05, multi_frac=0.2,
    )
    # second SAM over the same draft: different reads, same contig
    fasta2, sam2_text = synth.make_polish_case(
        seed=8, genome_len=700, n_reads=300, read_len=45, err=0.05,
        multi_frac=0.2, n_draft_errors=0,
    )
    # rewrite sam2 against the same assembly: identical contig name and
    # length, so it is a valid second alignment file for asm
    sam2 = tmp_path / "aln2.sam"
    sam2.write_text(sam2_text)
    fw_fa, fw_tsv = _framework_polish(tmp_path, asm, [sam1, sam2], "two")
    rp_fa, rp_tsv = _replica_polish(tmp_path, asm, [sam1, sam2], "two")
    assert fw_fa == rp_fa
    assert fw_tsv == rp_tsv


def test_polish_matches_replica_shuffled_groups(tmp_path):
    """Secondary '*'-seq line first in its group (strand recovery)."""
    fasta, sam_text = synth.make_polish_case(
        seed=11, genome_len=500, n_reads=300, read_len=40, err=0.06,
        multi_frac=0.5, shuffle_groups=True,
    )
    asm = tmp_path / "asm.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "aln.sam"
    sam.write_text(sam_text)
    fw_fa, fw_tsv = _framework_polish(tmp_path, asm, [sam], "shuf")
    rp_fa, rp_tsv = _replica_polish(tmp_path, asm, [sam], "shuf")
    assert fw_fa == rp_fa
    assert fw_tsv == rp_tsv


@pytest.mark.parametrize("seed", [3, 4, 5, 6])
def test_filter_matches_replica(tmp_path, seed):
    """Both output SAMs of the filter subcommand must be byte-identical
    between the framework and the replica (thresholds, orientation,
    pair-grid verdicts, ZP:Z:fail re-stream)."""
    from polypolish_tpu import log
    from polypolish_tpu.pipeline.filtering import filter_pairs

    s1, s2 = synth.make_filter_case(seed=seed)
    in1 = tmp_path / "in1.sam"
    in1.write_text(s1)
    in2 = tmp_path / "in2.sam"
    in2.write_text(s2)
    fw1, fw2 = tmp_path / "fw1.sam", tmp_path / "fw2.sam"
    with log.quiet():
        filter_pairs(str(in1), str(in2), str(fw1), str(fw2),
                     "auto", 0.1, 99.9)

    binary = replica.build()
    rp1, rp2 = tmp_path / "rp1.sam", tmp_path / "rp2.sam"
    proc = subprocess.run(
        [binary, "filter", "--in1", str(in1), "--in2", str(in2),
         "--out1", str(rp1), "--out2", str(rp2)],
        capture_output=True, check=False,
    )
    assert proc.returncode == 0, proc.stderr.decode()
    assert fw1.read_bytes() == rp1.read_bytes()
    assert fw2.read_bytes() == rp2.read_bytes()


@pytest.mark.parametrize("orientation,low,high", [
    ("fr", 1.0, 99.0), ("fr", 25.0, 75.0), ("auto", 0.1, 99.9),
])
def test_filter_matches_replica_params(tmp_path, orientation, low, high):
    from polypolish_tpu import log
    from polypolish_tpu.pipeline.filtering import filter_pairs

    s1, s2 = synth.make_filter_case(seed=9)
    in1 = tmp_path / "in1.sam"
    in1.write_text(s1)
    in2 = tmp_path / "in2.sam"
    in2.write_text(s2)
    fw1, fw2 = tmp_path / "fw1.sam", tmp_path / "fw2.sam"
    with log.quiet():
        filter_pairs(str(in1), str(in2), str(fw1), str(fw2),
                     orientation, low, high)
    binary = replica.build()
    rp1, rp2 = tmp_path / "rp1.sam", tmp_path / "rp2.sam"
    proc = subprocess.run(
        [binary, "filter", "--in1", str(in1), "--in2", str(in2),
         "--out1", str(rp1), "--out2", str(rp2),
         "--orientation", orientation, "--low", str(low),
         "--high", str(high)],
        capture_output=True, check=False,
    )
    assert proc.returncode == 0, proc.stderr.decode()
    assert fw1.read_bytes() == rp1.read_bytes()
    assert fw2.read_bytes() == rp2.read_bytes()


def test_filter_no_pairs_error_matches_replica(tmp_path):
    """An orientation with zero unique-unique pairs fatals identically
    on both sides (filter.rs:175-177 'no read pairs available')."""
    from polypolish_tpu import log
    from polypolish_tpu.errors import PolypolishError
    from polypolish_tpu.pipeline.filtering import filter_pairs

    s1, s2 = synth.make_filter_case(seed=9)
    in1 = tmp_path / "in1.sam"
    in1.write_text(s1)
    in2 = tmp_path / "in2.sam"
    in2.write_text(s2)
    with log.quiet(), pytest.raises(
            PolypolishError, match="no read pairs available"):
        filter_pairs(str(in1), str(in2), str(tmp_path / "o1.sam"),
                     str(tmp_path / "o2.sam"), "rf", 5.0, 95.0)
    binary = replica.build()
    proc = subprocess.run(
        [binary, "filter", "--in1", str(in1), "--in2", str(in2),
         "--out1", str(tmp_path / "r1.sam"),
         "--out2", str(tmp_path / "r2.sam"),
         "--orientation", "rf", "--low", "5.0", "--high", "95.0"],
        capture_output=True, check=False,
    )
    assert proc.returncode == 1
    assert b"no read pairs available" in proc.stderr


@pytest.mark.parametrize("seed", range(400, 406))
def test_polish_matches_replica_random_flags(tmp_path, seed):
    """Round-4 fuzz widening: random (careful, two-SAM, parameters)
    combinations must stay byte-identical to ppref (FASTA + TSV)."""
    rng = np.random.default_rng(seed)
    careful = bool(rng.integers(0, 2))
    two_files = bool(rng.integers(0, 2))
    kw = dict(
        fraction_invalid=float(rng.choice([0.1, 0.2, 0.3])),
        fraction_valid=float(rng.choice([0.4, 0.5, 0.6])),
        max_errors=int(rng.choice([3, 10, 25])),
        min_depth=int(rng.choice([1, 5, 9])),
        careful=careful,
    )
    asm, sam = _write_case(
        tmp_path, seed,
        genome_len=int(rng.integers(500, 2500)),
        n_reads=int(rng.integers(200, 1500)),
        read_len=int(rng.integers(30, 90)),
        err=float(rng.uniform(0.02, 0.15)),
        multi_frac=float(rng.uniform(0.0, 0.6)),
    )
    sams = [sam]
    if two_files:
        # second independent SAM against the same draft
        fasta2, sam_text2 = synth.make_polish_case(
            seed=seed + 10_000,
            genome_len=int(rng.integers(500, 2500)),
            n_reads=int(rng.integers(100, 800)),
            read_len=int(rng.integers(30, 90)),
        )
        # regenerate against the SAME assembly: reuse the first case's
        # draft by re-aligning is not available, so just duplicate the
        # first SAM with tweaked read names (all alignments legal for
        # this draft; doubles depth + group interactions)
        tweaked = "\n".join(
            (ln if ln.startswith("@") else "x" + ln)
            for ln in sam.read_text().splitlines()
        ) + "\n"
        sam2 = tmp_path / f"aln2_{seed}.sam"
        sam2.write_text(tweaked)
        sams = [sam, sam2]
    fw = _framework_polish(tmp_path, asm, sams, f"rf{seed}", **kw)
    ref = _replica_polish(tmp_path, asm, sams, f"rf{seed}", **kw)
    assert fw == ref, f"careful={careful} two_files={two_files} kw={kw}"
