"""Per-contig stats reporter text (C13; polish.rs:206-227) — locked by
recomputing the expected lines from the oracle's pileup."""

import io
import math
import re

import numpy as np
import pytest

import synth
from oracle import bankers, oracle_polish, OracleAln, ranges_with_trim

from polypolish_tpu import log
from polypolish_tpu.pipeline.polish import polish


def test_stats_lines(tmp_path, capsys):
    fasta, sam_text = synth.make_polish_case(seed=50, n_reads=300)
    asm = tmp_path / "a.fasta"
    asm.write_text(synth.fasta_text(fasta))
    sam = tmp_path / "a.sam"
    sam.write_text(sam_text)

    out = io.StringIO()
    polish(None, 0.2, 0.5, 10, 5, False, str(asm), [str(sam)], out=out,
           backend="host", use_native=False)
    err = capsys.readouterr().err

    # recompute expectations from the oracle debug lines
    _, debug = oracle_polish(fasta, [sam_text])
    depths = [float(l.split("\t")[3]) for l in debug]  # printed, not exact
    statuses = [l.split("\t")[7] for l in debug]
    seq_len = len(fasta[0][2])
    changed = sum(1 for s in statuses if s == "changed")
    changed_percent = 100.0 * changed / seq_len
    acc = 100.0 - changed_percent

    m = re.search(r"mean read depth: ([0-9.]+)x", err)
    assert m is not None
    m = re.search(r"([\d,]+) bp (has|have) a depth of zero \(([0-9.]+)% coverage\)", err)
    assert m is not None
    m = re.search(
        r"([\d,]+) positions? changed \(([0-9.]+)% of total positions\)", err
    )
    assert m is not None
    assert int(m.group(1).replace(",", "")) == changed
    assert m.group(2) == f"{changed_percent:.4f}"
    m = re.search(
        r"estimated pre-polishing sequence accuracy: ([0-9.]+)% \((Q[\d.]+|Q∞|Q0)\)",
        err,
    )
    assert m is not None
    assert m.group(1) == f"{acc:.4f}"
    if acc >= 100.0:
        assert m.group(2) == "Q∞"
    else:
        q = -10.0 * math.log10(1.0 - acc / 100.0)
        assert m.group(2) == f"Q{q:.2f}"

    # singular/plural parity: "1 position changed" vs "N positions changed"
    if changed == 1:
        assert "1 position changed" in err

    # kept/discarded alignment counts line up with the oracle's QC rule
    m = re.search(r"([\d,]+) alignments kept", err)
    assert m is not None
    kept = int(m.group(1).replace(",", ""))
    expected_kept = _count_good_alignments(sam_text, 10)
    assert kept == expected_kept


def _count_good_alignments(sam_text, max_errors):
    groups = []
    for line in sam_text.splitlines():
        if not line or line.startswith("@"):
            continue
        a = OracleAln(line)
        if not a.aligned:
            continue
        if groups and groups[-1][0].name == a.name:
            groups[-1].append(a)
        else:
            groups.append([a])
    total = 0
    for g in groups:
        total += sum(
            1 for a in g
            if a.end_to_end() and a.nm <= max_errors and not a.zp_fail
        )
    return total
