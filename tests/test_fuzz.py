"""Randomised differential fuzzing vs the oracle: many seeds, varied
generator parameters, byte-exact output comparison."""

import io

import pytest

import synth
from oracle import oracle_filter, oracle_polish

from polypolish_tpu.io.fasta import load_fasta
from polypolish_tpu.pipeline.filtering import filter_pairs
from polypolish_tpu.pipeline.polish import polish


@pytest.mark.parametrize("seed", range(100, 110))
def test_fuzz_polish(tmp_path, seed):
    params = dict(
        genome_len=300 + seed * 37 % 500,
        n_reads=150 + seed * 13 % 300,
        read_len=20 + seed % 40,
        err=0.02 + (seed % 5) * 0.03,
        multi_frac=(seed % 4) * 0.15,
        n_draft_errors=seed % 8,
    )
    fasta, sam_text = synth.make_polish_case(seed=seed, **params)
    asm = tmp_path / "a.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "a.sam"
    sam.write_text(sam_text)
    debug = tmp_path / "d.tsv"

    expected, expected_debug = oracle_polish(fasta, [sam_text])
    out = io.StringIO()
    polish(
        str(debug), 0.2, 0.5, 10, 5, False, str(asm), [str(sam)],
        out=out, backend="host", use_native=(seed % 2 == 0),
    )
    lines = out.getvalue().splitlines()
    assert lines[1] == expected["contig_1"], f"params={params}"
    assert debug.read_text().splitlines()[1:] == expected_debug


@pytest.mark.parametrize("seed", [300, 301])
@pytest.mark.parametrize("backend", ["sharded", "pallas"])
def test_fuzz_polish_device_backends(tmp_path, seed, backend):
    fasta, sam_text = synth.make_polish_case(
        seed=seed, genome_len=700, n_reads=400, multi_frac=0.3
    )
    asm = tmp_path / "a.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "a.sam"
    sam.write_text(sam_text)
    expected, _ = oracle_polish(fasta, [sam_text])
    out = io.StringIO()
    polish(
        None, 0.2, 0.5, 10, 5, False, str(asm), [str(sam)],
        out=out, backend=backend, use_native=True,
    )
    assert out.getvalue().splitlines()[1] == expected["contig_1"]


@pytest.mark.parametrize("seed", range(200, 205))
def test_fuzz_filter(tmp_path, seed):
    sam1, sam2 = synth.make_filter_case(
        seed=seed,
        n_pairs=100 + seed % 200,
        insert_mean=200 + (seed % 3) * 150,
        multi_frac=0.2 + (seed % 4) * 0.2,
    )
    in1, in2 = tmp_path / "i1.sam", tmp_path / "i2.sam"
    out1, out2 = tmp_path / "o1.sam", tmp_path / "o2.sam"
    in1.write_text(sam1)
    in2.write_text(sam2)
    filter_pairs(str(in1), str(in2), str(out1), str(out2))

    v1, v2, _, _, _ = oracle_filter(sam1, sam2)

    def check(sam_text, got, verdicts):
        idx = 0
        got_lines = got.splitlines()
        for i, line in enumerate(sam_text.splitlines()):
            if line.startswith("@") or int(line.split("\t")[1]) & 4:
                assert got_lines[i] == line
                continue
            if verdicts[idx]:
                assert got_lines[i] == line
            else:
                assert got_lines[i] == line + "\tZP:Z:fail"
            idx += 1

    check(sam1, out1.read_text(), v1)
    check(sam2, out2.read_text(), v2)


@pytest.mark.parametrize("seed", range(400, 420))
def test_fuzz_polish_vs_replica(tmp_path, seed):
    """Three-way differential fuzz: framework output must be
    byte-identical to the independent replica binary across randomized
    generator parameters (the oracle fuzz above covers the same ground
    from a third implementation)."""
    from polypolish_tpu.native import replica

    if replica.build() is None:
        pytest.skip("ppref build unavailable")
    params = dict(
        genome_len=250 + seed * 41 % 600,
        n_reads=120 + seed * 17 % 350,
        read_len=18 + seed % 45,
        err=0.02 + (seed % 6) * 0.025,
        multi_frac=(seed % 5) * 0.12,
        n_draft_errors=seed % 9,
        shuffle_groups=(seed % 3 == 0),
    )
    fasta, sam_text = synth.make_polish_case(seed=seed, **params)
    asm = tmp_path / "a.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "a.sam"
    sam.write_text(sam_text)
    debug = tmp_path / "d.tsv"
    out = io.StringIO()
    polish(
        str(debug), 0.2, 0.5, 10, 5, False, str(asm), [str(sam)],
        out=out, backend="host", use_native=(seed % 2 == 0),
    )
    rdbg = str(tmp_path / "r.tsv")
    proc = replica.run_polish(str(asm), [str(sam)], debug=rdbg)
    assert proc.returncode == 0, (params, proc.stderr.decode())
    assert out.getvalue().encode() == proc.stdout, f"params={params}"
    assert debug.read_bytes() == open(rdbg, "rb").read(), f"params={params}"


@pytest.mark.parametrize("seed", range(420, 430))
def test_fuzz_filter_vs_replica(tmp_path, seed):
    import subprocess

    from polypolish_tpu.native import replica

    if replica.build() is None:
        pytest.skip("ppref build unavailable")
    s1, s2 = synth.make_filter_case(seed=seed)
    in1 = tmp_path / "i1.sam"
    in1.write_text(s1)
    in2 = tmp_path / "i2.sam"
    in2.write_text(s2)
    fw1, fw2 = tmp_path / "f1.sam", tmp_path / "f2.sam"
    filter_pairs(str(in1), str(in2), str(fw1), str(fw2), "auto", 0.1, 99.9)
    rp1, rp2 = tmp_path / "r1.sam", tmp_path / "r2.sam"
    proc = subprocess.run(
        [replica.build(), "filter", "--in1", str(in1), "--in2", str(in2),
         "--out1", str(rp1), "--out2", str(rp2)],
        capture_output=True, check=False,
    )
    assert proc.returncode == 0, proc.stderr.decode()
    assert fw1.read_bytes() == rp1.read_bytes()
    assert fw2.read_bytes() == rp2.read_bytes()
