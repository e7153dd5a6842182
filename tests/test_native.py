"""Native C++ SAM packer must produce the exact same event streams,
stats, and end-to-end output as the pure-Python packer."""

import numpy as np
import pytest

import synth
from oracle import oracle_polish

from polypolish_tpu.errors import PolypolishError
from polypolish_tpu.native import loader
from polypolish_tpu.ops import pack
from polypolish_tpu.io.fasta import load_fasta
from polypolish_tpu.vocab import Vocab

native_available = loader.available()
pytestmark = pytest.mark.skipif(
    not native_available, reason="native packer unavailable"
)


def _run_both(tmp_path, fasta, sam_text, max_errors=10, careful=False):
    asm = tmp_path / "asm.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "aln.sam"
    sam.write_text(sam_text)

    fa = load_fasta(asm)
    results = []
    for process in (pack.process_sam, loader.process_sam_native):
        votes = pack.new_votes_from_fasta(fa)
        vocab = Vocab()
        stats = process(str(sam), votes, vocab, max_errors, careful)
        results.append((votes, vocab, stats))
    return results


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("careful", [False, True])
def test_native_matches_python(tmp_path, seed, careful):
    fasta, sam_text = synth.make_polish_case(seed=seed)
    (py_votes, py_vocab, py_stats), (nat_votes, nat_vocab, nat_stats) = _run_both(
        tmp_path, fasta, sam_text, careful=careful
    )
    assert py_stats == nat_stats
    assert py_vocab.strings == nat_vocab.strings
    for name in py_votes:
        p_pos, p_vid, p_w = py_votes[name].finalize()
        n_pos, n_vid, n_w = nat_votes[name].finalize()
        np.testing.assert_array_equal(p_pos, n_pos)
        np.testing.assert_array_equal(p_vid, n_vid)
        # weights must be BITWISE equal (f64 1/k divisions)
        np.testing.assert_array_equal(p_w, n_w)


@pytest.mark.parametrize("n_threads", [2, 4, 7])
def test_native_multithreaded_bit_exact(tmp_path, n_threads):
    """Thread-count invariance: any thread count must produce the exact
    same event stream, stats, and vocab order as single-threaded.

    The 1 MB minimum range is monkeypatched around by generating a file
    big enough to actually split."""
    fasta, sam_text = synth.make_polish_case(
        seed=11, genome_len=20_000, n_reads=12_000, read_len=60, err=0.05
    )
    asm = tmp_path / "asm.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "aln.sam"
    sam.write_text(sam_text)
    assert sam.stat().st_size > 2 * (1 << 20), "test file too small to split"

    fa = load_fasta(asm)
    results = []
    for threads in (1, n_threads):
        votes = pack.new_votes_from_fasta(fa)
        vocab = Vocab()
        stats = loader.process_sam_native(
            str(sam), votes, vocab, 10, False, n_threads=threads
        )
        p, v, w = votes["contig_1"].finalize()
        results.append((stats, vocab.strings, p, v, w))
    (s1, voc1, p1, v1, w1), (sn, vocn, pn, vn, wn) = results
    assert s1 == sn
    assert voc1 == vocn
    np.testing.assert_array_equal(p1, pn)
    np.testing.assert_array_equal(v1, vn)
    np.testing.assert_array_equal(w1, wn)


def test_native_group_spanning_many_ranges(tmp_path):
    """A single read group larger than the per-thread range (one read
    with tens of thousands of alignment locations) must be processed by
    exactly one thread."""
    rng = np.random.default_rng(12)
    genome = synth.rand_seq(rng, 50_000)
    fasta = [("ctg", "", genome)]
    lines = ["@HD\tVN:1.6"]
    seq = genome[100:200]
    # primary + ~150k secondaries for ONE read (~6.6 MB of SAM)
    lines.append(
        f"mega\t0\tctg\t101\t60\t100M\t*\t0\t0\t{seq}\t{'K' * 100}\tNM:i:0"
    )
    for i in range(150_000):
        p = int(rng.integers(0, 49_900))
        nm = synth.hamming(seq, genome[p:p + 100])
        lines.append(
            f"mega\t256\tctg\t{p + 1}\t0\t100M\t*\t0\t0\t*\t*\tNM:i:{nm}"
        )
    # a couple of normal reads after the mega-group
    for i in range(50):
        p = int(rng.integers(0, 49_900))
        s = genome[p:p + 100]
        lines.append(
            f"tail_{i:03d}\t0\tctg\t{p + 1}\t60\t100M\t*\t0\t0\t{s}"
            f"\t{'K' * 100}\tNM:i:0"
        )
    sam = tmp_path / "mega.sam"
    sam.write_text("\n".join(lines) + "\n")
    assert sam.stat().st_size > 3 * (1 << 20)

    asm = tmp_path / "asm.fasta"
    asm.write_text(synth.fasta_text(fasta))
    fa = load_fasta(asm)
    results = []
    for threads in (1, 4):
        votes = pack.new_votes_from_fasta(fa)
        vocab = Vocab()
        stats = loader.process_sam_native(
            str(sam), votes, vocab, 10, False, n_threads=threads
        )
        p, v, w = votes["ctg"].finalize()
        results.append((stats, p, v, w))
    (s1, p1, v1, w1), (s4, p4, v4, w4) = results
    assert s1 == s4
    np.testing.assert_array_equal(p1, p4)
    np.testing.assert_array_equal(v1, v4)
    np.testing.assert_array_equal(w1, w4)
    # cross-check against the Python packer too
    votes = pack.new_votes_from_fasta(fa)
    stats_py = pack.process_sam(str(sam), votes, Vocab(), 10, False)
    assert stats_py == s1
    pp, vp, wp = votes["ctg"].finalize()
    np.testing.assert_array_equal(pp, p1)
    np.testing.assert_array_equal(vp, v1)
    np.testing.assert_array_equal(wp, w1)


def test_native_end_to_end(tmp_path):
    import io

    from polypolish_tpu.pipeline.polish import polish

    fasta, sam_text = synth.make_polish_case(seed=5)
    asm = tmp_path / "asm.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "aln.sam"
    sam.write_text(sam_text)

    expected, expected_debug = oracle_polish(fasta, [sam_text])
    debug_path = tmp_path / "debug.tsv"
    out = io.StringIO()
    polish(
        str(debug_path), 0.2, 0.5, 10, 5, False, str(asm), [str(sam)],
        out=out, backend="host", use_native=True,
    )
    got_debug = debug_path.read_text().splitlines()[1:]
    assert got_debug == expected_debug
    lines = out.getvalue().splitlines()
    assert lines[1] == expected["contig_1"]


def test_native_error_messages(tmp_path):
    fasta, _ = synth.make_polish_case(seed=0, n_reads=5)
    asm = tmp_path / "asm.fasta"
    asm.write_text(synth.fasta_text(fasta))
    fa = load_fasta(asm)

    # missing NM tag
    sam = tmp_path / "bad.sam"
    sam.write_text("r\t0\tcontig_1\t10\t60\t4M\t*\t0\t0\tACTG\tKKKK\n")
    votes = pack.new_votes_from_fasta(fa)
    with pytest.raises(PolypolishError, match="missing NM tag"):
        loader.process_sam_native(str(sam), votes, Vocab(), 10, False)

    # invalid CIGAR
    sam.write_text("r\t0\tcontig_1\t10\t60\t4Q\t*\t0\t0\tACTG\tKKKK\tNM:i:0\n")
    votes = pack.new_votes_from_fasta(fa)
    with pytest.raises(PolypolishError, match="invalid CIGAR"):
        loader.process_sam_native(str(sam), votes, Vocab(), 10, False)

    # unknown contig
    sam.write_text("r\t0\tnope\t10\t60\t4M\t*\t0\t0\tACTG\tKKKK\tNM:i:0\n")
    votes = pack.new_votes_from_fasta(fa)
    with pytest.raises(PolypolishError, match="not in assembly"):
        loader.process_sam_native(str(sam), votes, Vocab(), 10, False)

    # no alignments
    sam.write_text("@HD\tVN:1.6\n")
    votes = pack.new_votes_from_fasta(fa)
    with pytest.raises(PolypolishError, match="no alignments"):
        loader.process_sam_native(str(sam), votes, Vocab(), 10, False)

    # too few columns
    sam.write_text("garbage line\n")
    votes = pack.new_votes_from_fasta(fa)
    with pytest.raises(PolypolishError, match="too few columns"):
        loader.process_sam_native(str(sam), votes, Vocab(), 10, False)


def _aln_line(name, flag, pos, extra=""):
    return (f"{name}\t{flag}\tc\t{pos}\t60\t4M\t*\t0\t0\tACTG\tKKKK\tNM:i:0"
            f"{extra}")


def test_native_rewrite_matches_python(tmp_path, monkeypatch):
    """The native filter re-stream must be byte-identical to the Python
    line loop, including headers, unaligned records, empty lines, CRLF
    endings, and a missing trailing newline."""
    from polypolish_tpu.pipeline import filtering

    sam_text = (
        "@HD\tVN:1.6\n"
        "@SQ\tSN:c\tLN:100\n"
        + _aln_line("r1", 0, 10) + "\n"
        + _aln_line("r2", 16, 20) + "\r\n"          # CRLF body line
        + _aln_line("r3", 4, 0) + "\n"              # unaligned: no verdict
        + "\n"                                        # empty line
        + _aln_line("r4", 0, 30, "\tXX:Z:extra") + "\n"
        + _aln_line("r5", 0, 40)                     # no trailing newline
    )
    src = tmp_path / "in.sam"
    src.write_bytes(sam_text.encode())
    verdicts = np.array([True, False, True, False], dtype=bool)

    out_native = tmp_path / "native.sam"
    pass_n = filtering._rewrite_sam(str(src), str(out_native), verdicts)

    out_python = tmp_path / "python.sam"
    monkeypatch.setattr(filtering, "_rewrite_native", lambda *a: None)
    pass_p = filtering._rewrite_sam(str(src), str(out_python), verdicts)

    assert pass_n == pass_p == 2
    assert out_native.read_bytes() == out_python.read_bytes()
    text = out_native.read_text()
    assert "\tZP:Z:fail" in text
    lines = text.splitlines()
    assert lines[3].endswith("ZP:Z:fail")            # r2 (verdict False)
    assert not lines[2].endswith("ZP:Z:fail")        # r1 (verdict True)
    assert lines[4].split("\t")[0] == "r3"           # unaligned untouched


@pytest.mark.parametrize("seed", [11, 12])
def test_native_rewrite_random_case(tmp_path, monkeypatch, seed):
    """Native vs Python rewrite on a synthetic filter pair (full files)."""
    from polypolish_tpu.pipeline import filtering

    rng = np.random.default_rng(seed)
    lines = ["@HD\tVN:1.6"]
    n_aligned = 0
    for i in range(200):
        flag = int(rng.choice([0, 16, 4]))
        if flag != 4:
            n_aligned += 1
        lines.append(_aln_line(f"read_{i}", flag, int(rng.integers(1, 90))))
    src = tmp_path / "in.sam"
    src.write_text("\n".join(lines) + "\n")
    verdicts = rng.random(n_aligned) < 0.5

    out_native = tmp_path / "native.sam"
    pn = filtering._rewrite_sam(str(src), str(out_native), verdicts)
    out_python = tmp_path / "python.sam"
    monkeypatch.setattr(filtering, "_rewrite_native", lambda *a: None)
    pp = filtering._rewrite_sam(str(src), str(out_python), verdicts)
    assert pn == pp == int(verdicts.sum())
    assert out_native.read_bytes() == out_python.read_bytes()
