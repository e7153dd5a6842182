"""Frozen golden test: a tiny, fully hand-verified case (every debug
line checked by hand against the consensus rule — see git history).

Unlike the oracle tests, these expectations are committed files, so a
bug introduced simultaneously into the pipeline and the oracle would
still be caught here.
"""

import io
import os

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("backend", ["host", "xla", "pallas"])
@pytest.mark.parametrize("use_native", [False, True])
def test_golden_tiny(tmp_path, backend, use_native):
    from polypolish_tpu.pipeline.polish import polish

    debug_path = tmp_path / f"dbg_{backend}_{use_native}.tsv"
    out = io.StringIO()
    polish(
        str(debug_path), 0.2, 0.5, 10, 5, False,
        os.path.join(GOLDEN, "tiny.fasta"),
        [os.path.join(GOLDEN, "tiny.sam")],
        out=out, backend=backend, use_native=use_native,
    )
    expected_fasta = open(os.path.join(GOLDEN, "tiny.expected.fasta")).read()
    expected_tsv = open(os.path.join(GOLDEN, "tiny.expected.tsv")).read()
    assert out.getvalue() == expected_fasta
    assert debug_path.read_text() == expected_tsv
