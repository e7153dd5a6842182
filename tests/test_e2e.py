"""End-to-end polish tests: pipeline (all backends) vs the independent
oracle, including byte-exact debug TSV comparison."""

import io
import os

import numpy as np
import pytest

import synth
from oracle import oracle_polish

from polypolish_tpu.pipeline.polish import polish


def _parse_fasta_out(text: str):
    records = {}
    name = None
    seq_parts = []
    for line in text.splitlines():
        if line.startswith(">"):
            if name is not None:
                records[name] = "".join(seq_parts)
            name = line[1:].split()[0]
            seq_parts = []
        else:
            seq_parts.append(line)
    if name is not None:
        records[name] = "".join(seq_parts)
    return records


def _run_pipeline(tmp_path, fasta, sam_texts, backend, tag, **kwargs):
    asm = tmp_path / f"asm_{tag}.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam_paths = []
    for i, text in enumerate(sam_texts):
        p = tmp_path / f"aln_{tag}_{i}.sam"
        p.write_text(text)
        sam_paths.append(str(p))
    debug_path = tmp_path / f"debug_{tag}.tsv"
    out = io.StringIO()
    polish(
        str(debug_path),
        kwargs.get("fraction_invalid", 0.2),
        kwargs.get("fraction_valid", 0.5),
        kwargs.get("max_errors", 10),
        kwargs.get("min_depth", 5),
        kwargs.get("careful", False),
        str(asm),
        sam_paths,
        out=out,
        backend=backend,
        use_native=kwargs.get("use_native", False),
    )
    debug_lines = debug_path.read_text().splitlines()
    assert debug_lines[0] == (
        "name\tpos\tbase\tdepth\tinvalid\tvalid\tpileup\tstatus\tnew_base"
    )
    return _parse_fasta_out(out.getvalue()), debug_lines[1:], out.getvalue()


@pytest.mark.parametrize("backend", ["host", "xla", "pallas", "sharded"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_polish_matches_oracle(tmp_path, backend, seed):
    fasta, sam_text = synth.make_polish_case(seed=seed)
    expected, expected_debug = oracle_polish(fasta, [sam_text])

    got, got_debug, _ = _run_pipeline(
        tmp_path, fasta, [sam_text], backend, f"{backend}_{seed}"
    )
    assert got == expected
    assert got_debug == expected_debug


@pytest.mark.parametrize("variant", ["lanes", "mxu"])
def test_polish_pallas_kernel_variants(tmp_path, variant, monkeypatch):
    """Both device vote kernels (round-3 lanes, round-2 mxu) must drive
    the pallas backend to oracle-identical output."""
    monkeypatch.setenv("POLYPOLISH_TPU_KERNEL", variant)
    fasta, sam_text = synth.make_polish_case(seed=4)
    expected, expected_debug = oracle_polish(fasta, [sam_text])
    got, got_debug, _ = _run_pipeline(
        tmp_path, fasta, [sam_text], "pallas", f"kv_{variant}"
    )
    assert got == expected
    assert got_debug == expected_debug


def test_polish_actually_fixes_draft_errors(tmp_path):
    fasta, sam_text = synth.make_polish_case(seed=3, n_reads=800, err=0.02)
    got, _, _ = _run_pipeline(tmp_path, fasta, [sam_text], "host", "fix")
    expected, _ = oracle_polish(fasta, [sam_text])
    assert got == expected
    # the polished sequence differs from the draft (errors were fixed)
    assert got["contig_1"] != fasta[0][2]


def test_polish_accuracy_on_clean_reads(tmp_path):
    """Functional quality check: at ~60x coverage of low-error reads,
    polishing should repair the vast majority of the substitution errors
    planted in the draft."""
    import numpy as np

    rng = np.random.default_rng(70)
    genome_len, read_len, n_errors = 2000, 60, 20
    true_genome = synth.rand_seq(rng, genome_len)
    draft = list(true_genome)
    sites = rng.choice(
        np.arange(read_len, genome_len - read_len), size=n_errors, replace=False
    )
    for s in sites:
        draft[s] = [b for b in "ACGT" if b != draft[s]][rng.integers(0, 3)]
    draft = "".join(draft)
    lines = ["@HD\tVN:1.6"]
    n_reads = genome_len * 60 // read_len
    for i in range(n_reads):
        p = int(rng.integers(0, genome_len - read_len))
        seq = true_genome[p:p + read_len]
        nm = synth.hamming(seq, draft[p:p + read_len])
        lines.append(
            f"q{i:05d}\t0\tcontig_1\t{p + 1}\t60\t{read_len}M\t*\t0\t0"
            f"\t{seq}\t{'K' * read_len}\tNM:i:{nm}"
        )
    sam_text = "\n".join(lines) + "\n"
    fasta = [("contig_1", "", draft)]
    got, _, _ = _run_pipeline(tmp_path, fasta, [sam_text], "host", "acc")
    polished = got["contig_1"]
    assert len(polished) == genome_len
    fixed = sum(1 for s in sites if polished[s] == true_genome[s])
    assert fixed >= int(0.9 * n_errors), f"only {fixed}/{n_errors} errors fixed"


def test_polish_shuffled_group_order(tmp_path):
    """Secondary '*'-seq lines may precede the seq-bearing line; the
    read sequence comes from the first non-'*' alignment in the group
    (alignment.rs:311-322)."""
    fasta, sam_text = synth.make_polish_case(
        seed=31, n_reads=300, multi_frac=0.6, shuffle_groups=True
    )
    expected, expected_debug = oracle_polish(fasta, [sam_text])
    for use_native in (False, True):
        got, got_debug, _ = _run_pipeline(
            tmp_path, fasta, [sam_text], "host", f"shuf_{use_native}",
            use_native=use_native,
        )
        assert got == expected
        assert got_debug == expected_debug


def test_polish_careful_mode(tmp_path):
    fasta, sam_text = synth.make_polish_case(seed=4)
    expected, expected_debug = oracle_polish(fasta, [sam_text], careful=True)
    got, got_debug, _ = _run_pipeline(
        tmp_path, fasta, [sam_text], "host", "careful", careful=True
    )
    assert got == expected
    assert got_debug == expected_debug


def test_polish_multiple_sam_files(tmp_path):
    fasta, sam1 = synth.make_polish_case(seed=5, n_reads=200)
    _, sam2 = synth.make_polish_case(seed=6, n_reads=200)
    expected, expected_debug = oracle_polish(fasta, [sam1, sam2])
    got, got_debug, _ = _run_pipeline(tmp_path, fasta, [sam1, sam2], "host", "multi")
    assert got == expected
    assert got_debug == expected_debug


def test_polish_multiple_sam_files_parallel_native(tmp_path):
    """The concurrent multi-file native loader must be byte-identical to
    the sequential path (including interleaved new vocab ids from
    insertion strings in both files)."""
    from polypolish_tpu.native import loader

    if not loader.available():
        pytest.skip("native library unavailable")
    fasta, sam1 = synth.make_polish_case(seed=5, n_reads=300, err=0.1)
    _, sam2 = synth.make_polish_case(seed=6, n_reads=300, err=0.1)
    expected, expected_debug = oracle_polish(fasta, [sam1, sam2])
    got, got_debug, _ = _run_pipeline(
        tmp_path, fasta, [sam1, sam2], "host", "par_native", use_native=True
    )
    assert got == expected
    assert got_debug == expected_debug


def test_polish_nondefault_parameters(tmp_path):
    fasta, sam_text = synth.make_polish_case(seed=7)
    kwargs = dict(
        fraction_invalid=0.3, fraction_valid=0.6, max_errors=4, min_depth=3
    )
    expected, expected_debug = oracle_polish(
        fasta, [sam_text], fraction_invalid=0.3, fraction_valid=0.6,
        max_errors=4, min_depth=3,
    )
    got, got_debug, _ = _run_pipeline(
        tmp_path, fasta, [sam_text], "host", "params", **kwargs
    )
    assert got == expected
    assert got_debug == expected_debug


def test_polish_output_header_format(tmp_path):
    fasta, sam_text = synth.make_polish_case(seed=8, n_reads=60)
    _, _, raw = _run_pipeline(tmp_path, fasta, [sam_text], "host", "hdr")
    first = raw.splitlines()[0]
    # ">{name} {description} polypolish" (polish.rs:196-202)
    assert first == ">contig_1 synthetic draft polypolish"


@pytest.mark.parametrize("backend,use_native", [
    ("host", False), ("xla", False), ("host", True),
])
def test_polish_multi_contig(tmp_path, backend, use_native):
    fasta, sam_text = synth.make_multi_contig_case(
        seed=30, n_contigs=3, genome_len=400, n_reads=250
    )
    expected, expected_debug = oracle_polish(fasta, [sam_text])
    got, got_debug, raw = _run_pipeline(
        tmp_path, fasta, [sam_text], backend, f"mc_{backend}_{use_native}",
        use_native=use_native,
    )
    assert got == expected
    assert got_debug == expected_debug
    # output order follows the assembly's contig order
    headers = [l for l in raw.splitlines() if l.startswith(">")]
    assert [h[1:].split()[0] for h in headers] == ["ctg_0", "ctg_1", "ctg_2"]


def test_polish_assembly_with_odd_characters(tmp_path):
    """Assembly containing N, IUPAC codes and lowercase (uppercased on
    load) must round-trip through vocab interning and consensus."""
    draft = "acgtNRYacgtACGTNNacgtACGTacgtACGT".upper()  # 33 bp
    fasta = [("weird", "", draft)]
    # reads copy the draft (so votes include N/R/Y characters), plus a
    # cohort voting G at position 5 (0-based 4: draft N -> changed to G)
    reads = []
    for i in range(30):
        seq = draft[2:28]
        if i % 2 == 0:
            seq = seq[:2] + "G" + seq[3:]
        reads.append(
            f"rd_{i:03d}\t0\tweird\t3\t60\t26M\t*\t0\t0\t{seq}\t*\tNM:i:3"
        )
    sam_text = "\n".join(["@HD\tVN:1.6"] + reads) + "\n"
    expected, expected_debug = oracle_polish(
        [("weird", "", draft.upper())], [sam_text], max_errors=20
    )
    got, got_debug, _ = _run_pipeline(
        tmp_path, [("weird", "", draft.upper())], [sam_text], "host", "odd",
        max_errors=20,
    )
    assert got == expected
    assert got_debug == expected_debug


def test_backends_agree(tmp_path):
    fasta, sam_text = synth.make_polish_case(seed=9)
    host, host_debug, _ = _run_pipeline(tmp_path, fasta, [sam_text], "host", "bh")
    xla, xla_debug, _ = _run_pipeline(tmp_path, fasta, [sam_text], "xla", "bx")
    assert host == xla
    assert host_debug == xla_debug
