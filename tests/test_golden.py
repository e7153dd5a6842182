"""Frozen golden tests: tiny hand-verified cases, one per targeted
reference rule (see tests/golden/make_goldens.py — the generator
asserts hand-derived expectations for every targeted TSV/FASTA line
against the independent replica binary before freezing, so a shared
misreading cannot be silently frozen).

Unlike the oracle tests, these expectations are committed files, so a
bug introduced simultaneously into the pipeline and the oracle would
still be caught here.
"""

import importlib.util
import io
import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

_spec = importlib.util.spec_from_file_location(
    "make_goldens", os.path.join(GOLDEN, "make_goldens.py")
)
_mg = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mg)

CASE_NAMES = sorted(_mg.CASES)


def _run(tmp_path, fasta, sam, backend, use_native, params, tag):
    from polypolish_tpu.pipeline.polish import polish

    debug_path = tmp_path / f"dbg_{tag}.tsv"
    out = io.StringIO()
    polish(
        str(debug_path), 0.2, 0.5, 10, 5, params.get("careful", False),
        fasta, [sam], out=out, backend=backend, use_native=use_native,
    )
    return out.getvalue(), debug_path.read_text()


@pytest.mark.parametrize("backend", ["host", "xla", "pallas"])
@pytest.mark.parametrize("use_native", [False, True])
def test_golden_tiny(tmp_path, backend, use_native):
    fasta_out, tsv_out = _run(
        tmp_path, os.path.join(GOLDEN, "tiny.fasta"),
        os.path.join(GOLDEN, "tiny.sam"), backend, use_native, {},
        f"{backend}_{use_native}",
    )
    assert fasta_out == open(os.path.join(GOLDEN, "tiny.expected.fasta")).read()
    assert tsv_out == open(os.path.join(GOLDEN, "tiny.expected.tsv")).read()


@pytest.mark.parametrize("name", CASE_NAMES)
@pytest.mark.parametrize("backend", ["host", "pallas"])
@pytest.mark.parametrize("use_native", [False, True])
def test_golden_case(tmp_path, name, backend, use_native):
    params = _mg.CASES[name]["params"]
    fasta_out, tsv_out = _run(
        tmp_path, os.path.join(GOLDEN, f"{name}.fasta"),
        os.path.join(GOLDEN, f"{name}.sam"), backend, use_native, params,
        f"{name}_{backend}_{use_native}",
    )
    exp_fasta = open(os.path.join(GOLDEN, f"{name}.expected.fasta")).read()
    exp_tsv = open(os.path.join(GOLDEN, f"{name}.expected.tsv")).read()
    assert fasta_out == exp_fasta
    assert tsv_out == exp_tsv


@pytest.mark.parametrize("name", CASE_NAMES)
def test_golden_case_xla(tmp_path, name):
    params = _mg.CASES[name]["params"]
    fasta_out, tsv_out = _run(
        tmp_path, os.path.join(GOLDEN, f"{name}.fasta"),
        os.path.join(GOLDEN, f"{name}.sam"), "xla", True, params,
        f"{name}_xla",
    )
    assert fasta_out == open(
        os.path.join(GOLDEN, f"{name}.expected.fasta")).read()
    assert tsv_out == open(
        os.path.join(GOLDEN, f"{name}.expected.tsv")).read()
