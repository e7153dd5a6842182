"""Windowed DEVICE path (round-4): huge-contig streaming through the
lanes kernel in position windows (pp_lanes_from_runs w_lo + depth-only
pp_fold_window) must be byte-identical to the host backend, across
window sizes and window boundaries, in O(window) host memory."""

import contextlib
import io
import importlib

import pytest

import tests.synth as synth
from polypolish_tpu.native import loader

polish_mod = importlib.import_module("polypolish_tpu.pipeline.polish")

pytestmark = pytest.mark.skipif(
    not loader.available(), reason="native library unavailable"
)


def _run(tmp_path, fasta, sams, monkeypatch, backend, window=None, tag=""):
    asm = tmp_path / f"asm{tag}.fasta"
    asm.write_text(synth.fasta_text(fasta))
    paths = []
    for i, s in enumerate(sams):
        p = tmp_path / f"aln{tag}_{i}.sam"
        p.write_text(s)
        paths.append(str(p))
    if window is None:
        monkeypatch.setenv("POLYPOLISH_TPU_WINDOW_MIN", "0")
    else:
        monkeypatch.setenv("POLYPOLISH_TPU_WINDOW_MIN", "1")
        monkeypatch.setenv("POLYPOLISH_TPU_WINDOW", str(window))
    # the windowed-device model cache is keyed on the padded window
    # size, so varying POLYPOLISH_TPU_WINDOW picks the right model
    # automatically (round-4 review finding) — no manual reset needed
    out = io.StringIO()
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        polish_mod.polish(None, 0.2, 0.5, 10, 5, False, str(asm), paths,
                          out=out, backend=backend)
    stats = [ln for ln in err.getvalue().splitlines()
             if any(k in ln for k in ("mean read depth", "coverage",
                                      "positions changed", "estimate"))]
    return out.getvalue(), stats


@pytest.mark.parametrize("window", [256, 1000, 4096])
def test_windowed_device_matches_host(tmp_path, monkeypatch, window):
    fasta, sam_text = synth.make_polish_case(
        seed=42, genome_len=5000, n_reads=3000, read_len=60, err=0.08,
        multi_frac=0.4,
    )
    host, host_stats = _run(tmp_path, fasta, [sam_text], monkeypatch,
                            "host", tag="h")
    dev, dev_stats = _run(tmp_path, fasta, [sam_text], monkeypatch,
                          "pallas", window=window, tag=f"d{window}")
    assert dev == host
    assert dev_stats == host_stats


def test_windowed_device_sparse_boundaries(tmp_path, monkeypatch):
    # heavy error rate -> sparse-tier (multi-base insertion) votes
    # crossing window boundaries
    fasta, sam_text = synth.make_polish_case(
        seed=77, genome_len=3000, n_reads=4000, read_len=50, err=0.15,
        multi_frac=0.5,
    )
    host, host_stats = _run(tmp_path, fasta, [sam_text], monkeypatch,
                            "host", tag="h2")
    dev, dev_stats = _run(tmp_path, fasta, [sam_text], monkeypatch,
                          "pallas", window=512, tag="d2")
    assert dev == host
    assert dev_stats == host_stats


def test_windowed_device_multi_contig(tmp_path, monkeypatch):
    fasta, sam_text = synth.make_multi_contig_case(
        seed=9, n_contigs=3, genome_len=1200, n_reads=900, read_len=40,
    )
    host, host_stats = _run(tmp_path, fasta, [sam_text], monkeypatch,
                            "host", tag="h3")
    dev, dev_stats = _run(tmp_path, fasta, [sam_text], monkeypatch,
                          "pallas", window=700, tag="d3")
    assert dev == host
    assert dev_stats == host_stats


def test_lanes_pack_window_origin(tmp_path):
    """pp_lanes_from_runs with w_lo must equal the full pack restricted
    to the window (counts-wise)."""
    import numpy as np

    from polypolish_tpu.io.fasta import load_fasta
    from polypolish_tpu.native import runs as native_runs
    from polypolish_tpu.vocab import Vocab

    fasta, sam_text = synth.make_polish_case(
        seed=5, genome_len=3000, n_reads=1500, read_len=60, err=0.08,
        multi_frac=0.4,
    )
    asm = tmp_path / "a.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "a.sam"
    sam.write_text(sam_text)
    fa = load_fasta(asm)
    names = [n for n, _, _ in fa]
    lens = {n: len(s) for n, _, s in fa}
    pr = native_runs.parse_runs([str(sam)], names, lens, Vocab(), 10,
                                False)
    import jax.numpy as jnp

    from polypolish_tpu.ops.vote_lanes import _lanes_jit

    name = names[0]
    P = lens[name]
    counts_ref = pr.fold(name)[0]
    W = 1024
    for w_lo in range(0, P, W):
        w_real = min(P, w_lo + W) - w_lo
        pack = pr.lanes(name, 8, 128, num_positions=W, w_lo=w_lo)
        counts_w = np.asarray(_lanes_jit(
            jnp.asarray(pack.vb.view(np.int8)),
            jnp.asarray(pack.block_tile),
            n_tiles=pack.n_tiles, interpret=True, r_sub=8, tile_w=128,
        ))[:, :W]
        pack.close()
        np.testing.assert_array_equal(
            counts_w[:, :w_real], counts_ref[:, w_lo:w_lo + w_real],
            err_msg=f"window at {w_lo}",
        )
        assert counts_w[:, w_real:].sum() == 0
    pr.close()


@pytest.mark.parametrize("depth", ["2", "3"])
def test_windowed_device_pipeline_depth(tmp_path, monkeypatch, depth):
    """Deeper in-flight window pipelines (POLYPOLISH_TPU_WINDOW_DEPTH)
    must not change the output — the FIFO fetch order preserves the
    strict left-fold depth accounting."""
    fasta, sam_text = synth.make_polish_case(
        seed=42, genome_len=5000, n_reads=3000, read_len=60, err=0.08,
        multi_frac=0.4,
    )
    host, host_stats = _run(tmp_path, fasta, [sam_text], monkeypatch,
                            "host", tag=f"hd{depth}")
    monkeypatch.setenv("POLYPOLISH_TPU_WINDOW_DEPTH", depth)
    dev, dev_stats = _run(tmp_path, fasta, [sam_text], monkeypatch,
                          "pallas", window=777, tag=f"dd{depth}")
    assert dev == host
    assert dev_stats == host_stats


def test_windowed_device_mxu_overflow_mode(tmp_path, monkeypatch):
    """The windowed device pipeline with the MXU overflow mode forced —
    the configuration real chips take by default since round 5 — must
    match the host byte-for-byte (interpret-mode MXU kernel here)."""
    monkeypatch.setenv("POLYPOLISH_TPU_OV_MODE", "mxu")
    fasta, sam_text = synth.make_polish_case(
        seed=43, genome_len=5000, n_reads=3000, read_len=60, err=0.08,
        multi_frac=0.5,
    )
    host, host_stats = _run(tmp_path, fasta, [sam_text], monkeypatch,
                            "host", tag="hm")
    dev, dev_stats = _run(tmp_path, fasta, [sam_text], monkeypatch,
                          "pallas", window=777, tag="dm")
    assert dev == host
    assert dev_stats == host_stats
