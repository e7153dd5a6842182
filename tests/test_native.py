"""Native C++ SAM packer must produce the exact same event streams,
stats, and end-to-end output as the pure-Python packer."""

import os

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


def test_native_debug_tsv_parity_handcrafted(tmp_path, monkeypatch):
    """Byte parity on adversarial content: exact .x5 decimal-tie depths
    (round-half-even), sparse-tier insertion strings, deletion adoption,
    every status value."""
    from polypolish_tpu.ops.consensus import STATUS_STRINGS
    import importlib

    polish_mod = importlib.import_module('polypolish_tpu.pipeline.polish')

    vocab = Vocab()
    vid_ag = vocab.intern("AG")
    vid_tta = vocab.intern("TTA")

    seq = "ACGTNACGTACG"
    n = len(seq)
    # depths engineered to include exact binary ties at 1 decimal:
    # 0.25, 0.75, 2.25, 2.75 (representable exactly -> decimal ties),
    # plus 1/3 and 1/7 sums and huge/zero values
    depth = np.asarray([
        0.25, 0.75, 2.25, 2.75, 1.0 / 3.0, 1.0 / 7.0 * 3, 0.0,
        12.05, 19.999999999999996, 1e15, 5.0, 0.5,
    ], dtype=np.float64)
    rng = np.random.default_rng(7)
    counts = rng.integers(0, 5, size=(8, n)).astype(np.int32)
    counts[6:, :] = 0  # reserved dense slots never take votes
    invalid_thr = rng.integers(0, 4, size=n).astype(np.int32)
    valid_thr = (invalid_thr + rng.integers(0, 4, size=n)).astype(np.int32)
    status = np.asarray(
        [i % len(STATUS_STRINGS) for i in range(n)], dtype=np.int32
    )
    from polypolish_tpu.ops.consensus import ST_CHANGED

    new_id = np.zeros(n, dtype=np.int32)
    for i in range(n):
        if status[i] == ST_CHANGED:
            new_id[i] = [0, 2, vid_ag, vid_tta][i % 4]
    sparse_by_pos = {
        1: [(vid_ag, 3)],
        4: [(vid_ag, 1), (vid_tta, 2)],
        n - 1: [(vid_tta, 7)],
    }

    out_native = tmp_path / "native.tsv"
    with open(out_native, "wt") as f:
        assert polish_mod._write_debug_lines_native(
            f, "contig_1", seq, depth, invalid_thr, valid_thr, counts,
            sparse_by_pos, status, new_id, vocab,
        )
    out_python = tmp_path / "python.tsv"
    monkeypatch.setattr(
        polish_mod, "_write_debug_lines_native", lambda *a, **k: False
    )
    with open(out_python, "wt") as f:
        polish_mod._write_debug_lines(
            f, "contig_1", seq, depth, invalid_thr, valid_thr, counts,
            sparse_by_pos, status, new_id, vocab,
        )
    assert out_native.read_bytes() == out_python.read_bytes()
    text = out_native.read_text()
    assert "AGx3" in text and "TTAx" in text
    # exact ties round half-to-even in both writers
    first_cols = [l.split("\t")[3] for l in text.splitlines()]
    assert first_cols[0] == "0.2" and first_cols[1] == "0.8"
    assert first_cols[2] == "2.2" and first_cols[3] == "2.8"


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_native_debug_tsv_parity_fuzz(tmp_path, monkeypatch, seed):
    from polypolish_tpu.ops.consensus import STATUS_STRINGS
    import importlib

    polish_mod = importlib.import_module('polypolish_tpu.pipeline.polish')

    rng = np.random.default_rng(seed)
    vocab = Vocab()
    extra = [vocab.intern(s) for s in ("AAG", "CT", "GGGG", "NA")]
    n = int(rng.integers(50, 400))
    seq = "".join(rng.choice(list("ACGTN"), size=n))
    # random f64 depths built from 1/k sums like the real pipeline
    k = rng.integers(1, 9, size=(n, 6))
    take = rng.random((n, 6)) < 0.7
    depth = np.sum(np.where(take, 1.0 / k, 0.0), axis=1)
    counts = rng.integers(0, 30, size=(8, n)).astype(np.int32)
    counts[6:, :] = 0
    invalid_thr = rng.integers(0, 10, size=n).astype(np.int32)
    valid_thr = (invalid_thr + rng.integers(0, 10, size=n)).astype(np.int32)
    status = rng.integers(0, len(STATUS_STRINGS), size=n).astype(np.int32)
    new_id = rng.choice([0, 1, 2, 3, 4] + extra, size=n).astype(np.int32)
    sparse_by_pos = {}
    for p in rng.choice(n, size=min(n // 5, 20), replace=False):
        items = [
            (int(rng.choice(extra)), int(rng.integers(1, 9)))
            for _ in range(int(rng.integers(1, 3)))
        ]
        sparse_by_pos[int(p)] = items

    out_native = tmp_path / "native.tsv"
    with open(out_native, "wt") as f:
        assert polish_mod._write_debug_lines_native(
            f, f"ctg{seed}", seq, depth, invalid_thr, valid_thr, counts,
            sparse_by_pos, status, new_id, vocab,
        )
    out_python = tmp_path / "python.tsv"
    monkeypatch.setattr(
        polish_mod, "_write_debug_lines_native", lambda *a, **k: False
    )
    with open(out_python, "wt") as f:
        polish_mod._write_debug_lines(
            f, f"ctg{seed}", seq, depth, invalid_thr, valid_thr, counts,
            sparse_by_pos, status, new_id, vocab,
        )
    assert out_native.read_bytes() == out_python.read_bytes()


def test_fold_thresholds_match_numpy(tmp_path):
    """The C++ single-pass thresholds (computed in the fold's depth
    thread) must be bit-identical to ops.consensus.compute_thresholds,
    including banker's .5 ties from fractional 1/k weights."""
    from polypolish_tpu.native import runs as native_runs
    from polypolish_tpu.ops.consensus import compute_thresholds

    fasta, sam_text = synth.make_polish_case(
        seed=17, genome_len=800, n_reads=600, read_len=40, err=0.05,
        multi_frac=0.5,
    )
    asm = tmp_path / "a.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "a.sam"
    sam.write_text(sam_text)
    fa = load_fasta(asm)
    names = [n for n, _, _ in fa]
    lens = {n: len(s) for n, _, s in fa}
    pr = native_runs.parse_runs([str(sam)], names, lens, Vocab(), 10, False)
    for md, f_v, f_i in ((5, 0.5, 0.2), (2, 0.6, 0.3), (1, 0.9, 0.1)):
        counts, depth, sparse, (v, i, low) = pr.fold(
            names[0], thresholds=(md, f_v, f_i)
        )
        v_ref, i_ref, low_ref = compute_thresholds(depth, md, f_v, f_i)
        assert np.array_equal(v, v_ref)
        assert np.array_equal(i, i_ref)
        assert np.array_equal(low, low_ref)
    pr.close()


def test_consensus_dense_native_matches_numpy():
    """The C++ blocked/threaded consensus pass must match the numpy
    decision for randomized counts/thresholds, including count-0 ACGT
    intermediate participation and every status code."""
    from polypolish_tpu.native import binding
    from polypolish_tpu.ops.consensus import consensus_dense_numpy

    rng = np.random.default_rng(23)
    for trial in range(6):
        P = int(rng.integers(50, 5000))
        counts = rng.integers(0, 12, size=(8, P)).astype(np.int32)
        counts[rng.random((8, P)) < 0.5] = 0
        depth = counts.sum(axis=0).astype(np.float64)
        vt = np.maximum(2, (depth * 0.5).astype(np.int64)).astype(np.int32)
        it = (depth * 0.2).astype(np.int32)
        low = depth < 2
        orig = rng.integers(0, 8, size=P).astype(np.int32)
        nid_ref, st_ref = consensus_dense_numpy(counts, vt, it, low, orig)
        nid, st = binding.consensus_dense_native(counts, vt, it, low, orig)
        np.testing.assert_array_equal(nid, nid_ref)
        np.testing.assert_array_equal(st, st_ref)


def test_u16_fold_saturation_fallback(tmp_path):
    """A (pos, vocab) pair with > 65535 votes saturates the u16 staging
    tensor; the widen pass must detect it and re-fold that range through
    the exact int32 path (results identical to the u16-disabled run)."""
    import subprocess
    import sys

    # 70k reads all voting the same base at the same positions
    n = 70_000
    lines = ["@SQ\tSN:c\tLN:64"]
    for i in range(n):
        lines.append(f"r{i}\t0\tc\t1\t60\t4M\t*\t0\t0\tACGT\tKKKK\tNM:i:0")
    sam = tmp_path / "deep.sam"
    sam.write_text("\n".join(lines) + "\n")
    asm = tmp_path / "a.fasta"
    asm.write_text(">c x\n" + "ACGT" * 16 + "\n")

    code = (
        "import io, sys\n"
        "from polypolish_tpu import log\n"
        "from polypolish_tpu.pipeline.polish import polish\n"
        "out = io.StringIO()\n"
        "with log.quiet():\n"
        "    polish(None, 0.2, 0.5, 10, 5, False, sys.argv[1],"
        " [sys.argv[2]], out=out, backend='host')\n"
        "sys.stdout.write(out.getvalue())\n"
    )
    outs = {}
    for u16 in ("1", "0"):
        env = dict(os.environ, POLYPOLISH_TPU_U16_FOLD=u16)
        p = subprocess.run([sys.executable, "-c", code, str(asm), str(sam)],
                           env=env, capture_output=True, text=True)
        assert p.returncode == 0, p.stderr[-500:]
        outs[u16] = p.stdout
    assert outs["1"] == outs["0"]
    # counts themselves: verify > 65535 at position 0 via the fold
    from polypolish_tpu.io.fasta import load_fasta
    from polypolish_tpu.native import runs as nruns
    from polypolish_tpu.vocab import Vocab

    fa = load_fasta(asm)
    names = [nm for nm, _, _ in fa]
    lens = {nm: len(s) for nm, _, s in fa}
    pr = nruns.parse_runs([str(sam)], names, lens, Vocab(), 10, False)
    counts, _d, _s, _t = pr.fold("c", thresholds=(5, 0.5, 0.2))
    assert counts.max() >= n - 1, "test must actually exceed u16 range"
    pr.close()


def test_native_sparse_contig_matches_fold(tmp_path):
    """pp_sparse_contig (the zero-copy-aware sparse extractor) must
    return exactly the fold's sparse tier on workloads with interned
    insertions and reused secondaries."""
    fasta, sam_text = synth.make_polish_case(
        seed=77, genome_len=3000, n_reads=2500, read_len=60, err=0.15,
        multi_frac=0.6,
    )
    asm = tmp_path / "a.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "a.sam"
    sam.write_text(sam_text)
    from polypolish_tpu.io.fasta import load_fasta
    from polypolish_tpu.native import runs as nruns
    from polypolish_tpu.vocab import Vocab

    fa = load_fasta(asm)
    names = [nm for nm, _, _ in fa]
    lens = {nm: len(s) for nm, _, s in fa}
    pr = nruns.parse_runs([str(sam)], names, lens, Vocab(), 10, False)
    for name in names:
        want = pr.fold(name)[2]
        got = pr.sparse(name)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
        np.testing.assert_array_equal(got[2], want[2])
    pr.close()
