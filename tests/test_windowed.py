"""Windowed host path (huge-contig streaming fold): byte-identical
FASTA + identical stderr stats vs the full-length host path, across
window sizes and window boundaries (pp_fold_window semantics)."""

import io

import numpy as np
import pytest

import tests.synth as synth
from polypolish_tpu import log
from polypolish_tpu.native import loader
from polypolish_tpu.pipeline.polish import polish

pytestmark = pytest.mark.skipif(
    not loader.available(), reason="native library unavailable"
)


def _run(tmp_path, fasta, sams, monkeypatch, window_min, window=None,
         tag="", multi_window=True):
    asm = tmp_path / f"asm{tag}.fasta"
    asm.write_text(synth.fasta_text(fasta))
    paths = []
    for i, s in enumerate(sams):
        p = tmp_path / f"aln{tag}_{i}.sam"
        p.write_text(s)
        paths.append(str(p))
    monkeypatch.setenv("POLYPOLISH_TPU_WINDOW_MIN", str(window_min))
    if window is not None:
        monkeypatch.setenv("POLYPOLISH_TPU_WINDOW", str(window))
        # the effective window must be exactly what we asked for — the
        # round-3 1 MiB floor silently turned every small test window
        # into a single-window run (ADVICE round 3)
        import importlib

        polish_mod = importlib.import_module(
            "polypolish_tpu.pipeline.polish"
        )
        assert polish_mod._window_size() == window
        if multi_window:
            longest = max(len(seq) for _n, _d, seq in fasta)
            assert longest > window, (
                f"test misconfigured: window {window} >= longest contig "
                f"{longest} — boundary logic not exercised"
            )
    out = io.StringIO()
    err = io.StringIO()
    import contextlib

    with contextlib.redirect_stderr(err):
        polish(None, 0.2, 0.5, 10, 5, False, str(asm), paths,
               out=out, backend="host")
    # stats lines must match too (mean depth / coverage / changed)
    stats = [ln for ln in err.getvalue().splitlines()
             if any(k in ln for k in ("mean read depth", "coverage:",
                                      "positions changed", "estimate"))]
    return out.getvalue(), stats


@pytest.mark.parametrize("window", [1 << 20, 1500, 997, 4096])
def test_windowed_matches_full(tmp_path, monkeypatch, window):
    fasta, sam_text = synth.make_polish_case(
        seed=31, genome_len=5000, n_reads=3000, read_len=60, err=0.08,
        multi_frac=0.4,
    )
    full, full_stats = _run(tmp_path, fasta, [sam_text], monkeypatch,
                window_min=0, tag="f")  # 0 -> windowing disabled
    win, win_stats = _run(tmp_path, fasta, [sam_text], monkeypatch,
               window_min=1, window=window, tag=f"w{window}",
               # the 1<<20 case deliberately covers the degenerate
               # single-window run of the windowed code path
               multi_window=(window < 5000))
    assert win == full
    assert win_stats == full_stats


def test_windowed_with_insertions_and_sparse(tmp_path, monkeypatch):
    # heavy error rate -> plenty of sparse-tier (multi-base insertion)
    # votes crossing window boundaries
    fasta, sam_text = synth.make_polish_case(
        seed=77, genome_len=3000, n_reads=4000, read_len=50, err=0.15,
        multi_frac=0.5,
    )
    full, full_stats = _run(tmp_path, fasta, [sam_text], monkeypatch, 0, tag="f2")
    win, win_stats = _run(tmp_path, fasta, [sam_text], monkeypatch, 1, 512, tag="w2")
    assert win == full
    assert win_stats == full_stats


def test_windowed_multi_contig(tmp_path, monkeypatch):
    fasta, sam_text = synth.make_multi_contig_case(
        seed=9, n_contigs=3, genome_len=1200, n_reads=900, read_len=40,
    )
    full, full_stats = _run(tmp_path, fasta, [sam_text], monkeypatch, 0, tag="f3")
    win, win_stats = _run(tmp_path, fasta, [sam_text], monkeypatch, 1, 777, tag="w3")
    assert win == full
    assert win_stats == full_stats
