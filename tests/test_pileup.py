"""Ports of the pileup.rs consensus tests (pileup.rs:204-296).

Each reference test builds one PileupBase, adds sequences with depth
contributions, and checks the count string + polished base + status.
Here the same scenarios run through the real event-stream machinery:
vote counting (host backend), f64 thresholds, and both the dense numpy
consensus and the full candidate-list scalar consensus.
"""

import numpy as np
import pytest

from polypolish_tpu.ops.consensus import (
    ST_CHANGED,
    ST_KEPT,
    ST_LOW_DEPTH,
    ST_MULTIPLE,
    ST_TOO_CLOSE,
    compute_thresholds,
    consensus_dense_numpy,
    consensus_one_position,
)
from polypolish_tpu.ops.vote import count_votes
from polypolish_tpu.pipeline.polish import pileup_count_str
from polypolish_tpu.vocab import DENSE_V, Vocab


def run_pileup(seqs_weights, orig_char, min_depth=5, fv=0.5, fi=0.2):
    """Feed (seq, weight) votes at position 0 through the real pipeline
    pieces; return (count_str, new_seq, status)."""
    vocab = Vocab()
    pos = np.zeros(len(seqs_weights), dtype=np.int64)
    vid = np.array([vocab.intern(s) for s, _ in seqs_weights], dtype=np.int32)
    weight = np.array([w for _, w in seqs_weights], dtype=np.float64)
    counts, depth, sparse = count_votes(pos, vid, weight, 1, backend="host")
    valid_thr, invalid_thr, low_depth = compute_thresholds(depth, min_depth, fv, fi)
    orig_id = np.array([vocab.intern(orig_char)], dtype=np.int32)

    sp_pos, sp_vid, sp_cnt = sparse
    sparse_items = list(zip(sp_vid.tolist(), sp_cnt.tolist()))
    if sparse_items:
        cands = [
            (v, int(counts[v, 0]))
            for v in range(DENSE_V)
            if v in (1, 2, 3, 4) or counts[v, 0] > 0
        ]
        cands.extend(sparse_items)
        nid, st, _, _ = consensus_one_position(
            cands, int(orig_id[0]), float(depth[0]), min_depth, fv, fi
        )
    else:
        new_id, status = consensus_dense_numpy(
            counts, valid_thr, invalid_thr, low_depth, orig_id
        )
        nid, st = int(new_id[0]), int(status[0])

    count_str = pileup_count_str(counts[:, 0], sparse_items, vocab)
    return count_str, vocab.string(nid), st


def test_pileupbase_01():
    cs, seq, st = run_pileup([("A", 1.0)] * 50, "A")
    assert cs == "Ax50"
    assert seq == "A"
    assert st == ST_KEPT


def test_pileupbase_02():
    votes = [("A", 1.0), ("T", 1.0)] + [("G", 1.0)] * 50
    cs, seq, st = run_pileup(votes, "G")
    assert cs == "Ax1,Gx50,Tx1"
    assert seq == "G"
    assert st == ST_KEPT


def test_pileupbase_03():
    votes = [("C", 1.0)] + [("A", 1.0)] * 99
    cs, seq, st = run_pileup(votes, "T")
    assert cs == "Ax99,Cx1"
    assert seq == "A"
    assert st == ST_CHANGED


def test_pileupbase_04():
    votes = [("T", 1.0), ("C", 1.0), ("G", 1.0)]
    cs, seq, st = run_pileup(votes, "A")
    assert cs == "Cx1,Gx1,Tx1"
    assert seq == "A"
    assert st == ST_LOW_DEPTH


def test_pileupbase_05():
    votes = [("A", 0.1)] * 123 + [("T", 0.1)] * 321
    cs, seq, st = run_pileup(votes, "C")
    assert cs == "Ax123,Tx321"
    assert seq == "C"
    assert st == ST_MULTIPLE


def test_pileupbase_06():
    votes = [("A", 1.0)] * 6 + [("C", 1.0)] * 4
    cs, seq, st = run_pileup(votes, "T")
    assert cs == "Ax6,Cx4"
    assert seq == "T"
    assert st == ST_TOO_CLOSE


def test_pileupbase_07():
    votes = [("A", 1.0)] * 9 + [("C", 1.0)]
    cs, seq, st = run_pileup(votes, "T", fv=0.5, fi=0.1)
    assert cs == "Ax9,Cx1"
    assert seq == "T"
    assert st == ST_TOO_CLOSE


def test_pileupbase_08():
    votes = [("A", 1.0)] * 19 + [("C", 1.0)]
    cs, seq, st = run_pileup(votes, "T", fv=0.5, fi=0.1)
    assert cs == "Ax19,Cx1"
    assert seq == "A"
    assert st == ST_CHANGED


def test_deletion_votes():
    votes = [("-", 1.0)] * 20 + [("A", 1.0)]
    cs, seq, st = run_pileup(votes, "A")
    assert cs == "-x20,Ax1"
    assert seq == "-"
    assert st == ST_CHANGED


def test_insertion_votes_sparse_tier():
    votes = [("AG", 1.0)] * 20 + [("A", 1.0)]
    cs, seq, st = run_pileup(votes, "A")
    assert cs == "AGx20,Ax1"
    assert seq == "AG"
    assert st == ST_CHANGED


def test_zero_count_acgt_can_be_intermediate():
    """With invalid_threshold == 0, zero-count A/C/G/T land in the
    intermediate set (reference's elif chain at pileup.rs:77-99), which
    turns a would-be adoption into TooClose."""
    # depth 2 -> invalid_thr = round(0.4) = 0; valid_thr = max(0, 1) = 1
    votes = [("A", 1.0)] * 2
    cs, seq, st = run_pileup(votes, "T", min_depth=0, fv=0.5, fi=0.2)
    assert cs == "Ax2"
    assert st == ST_TOO_CLOSE
    assert seq == "T"


def test_dense_vs_scalar_consensus_random():
    """Property test: the dense numpy consensus must agree with the
    scalar full-candidate-list consensus on dense-only pileups."""
    rng = np.random.default_rng(42)
    for _ in range(300):
        n = int(rng.integers(0, 40))
        votes = [
            (rng.choice(["A", "C", "G", "T", "-", "N"]), float(rng.choice([1.0, 0.5, 0.25, 1 / 3])))
            for _ in range(n)
        ]
        orig = str(rng.choice(["A", "C", "G", "T", "N"]))
        min_depth = int(rng.integers(0, 8))
        fv = float(rng.uniform(0.3, 0.9))
        fi = float(rng.uniform(0.05, min(0.29, fv - 0.01)))

        vocab = Vocab()
        pos = np.zeros(n, dtype=np.int64)
        vid = np.array([vocab.intern(s) for s, _ in votes], dtype=np.int32)
        weight = np.array([w for _, w in votes], dtype=np.float64)
        counts, depth, _ = count_votes(pos, vid, weight, 1, backend="host")
        valid_thr, invalid_thr, low_depth = compute_thresholds(
            depth, min_depth, fv, fi
        )
        orig_id = np.array([vocab.intern(orig)], dtype=np.int32)
        new_id, status = consensus_dense_numpy(
            counts, valid_thr, invalid_thr, low_depth, orig_id
        )
        cands = [
            (v, int(counts[v, 0]))
            for v in range(DENSE_V)
            if v in (1, 2, 3, 4) or counts[v, 0] > 0
        ]
        nid2, st2, vt2, it2 = consensus_one_position(
            cands, int(orig_id[0]), float(depth[0]), min_depth, fv, fi
        )
        assert int(new_id[0]) == nid2
        assert int(status[0]) == st2
        assert int(valid_thr[0]) == vt2
        assert int(invalid_thr[0]) == it2
