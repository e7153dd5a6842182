"""Lane-aligned VPU vote kernel (ops/vote_lanes.py): bitwise equality
against the host fold, layout invariants, and slab splitting.

Mirrors tests/test_pallas.py's strategy for the MXU kernels: the lanes
kernel must produce counts bitwise identical to dense_counts_host on
every workload (pileup.rs:56-65 parity chain).
"""

import numpy as np
import pytest

from polypolish_tpu.ops import vote_lanes
from polypolish_tpu.ops.vote import dense_counts_host
from polypolish_tpu.ops.vote_lanes import (
    PAD_BYTE,
    dense_counts_lanes,
    prepare_lanes,
)
from polypolish_tpu.vocab import DENSE_V


def rand_events(n, num_positions, seed, sparse_frac=0.0, skew=False):
    rng = np.random.default_rng(seed)
    if skew:
        # repeat-pileup shape: half the events in 1% of positions
        hot = rng.integers(0, max(1, num_positions // 100), size=n // 2)
        cold = rng.integers(0, num_positions, size=n - n // 2)
        pos = np.concatenate([hot, cold])
    else:
        pos = rng.integers(0, num_positions, size=n)
    vocab = rng.integers(0, DENSE_V, size=n)
    if sparse_frac:
        m = rng.random(n) < sparse_frac
        vocab = np.where(m, rng.integers(DENSE_V, DENSE_V + 40, size=n), vocab)
    return pos.astype(np.int64), vocab.astype(np.int32)


@pytest.mark.parametrize("n,p,seed", [
    (0, 100, 0),
    (1, 1, 1),
    (1000, 257, 2),
    (20000, 4096, 3),
    (50000, 1000, 4),
])
def test_lanes_matches_host(n, p, seed):
    pos, vocab = rand_events(n, p, seed, sparse_frac=0.1)
    got = np.asarray(dense_counts_lanes(pos, vocab, p))
    want = dense_counts_host(pos, vocab, p)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("r_sub", [8, 16, 32])
@pytest.mark.parametrize("tile_w", [128, 256, 1024])
@pytest.mark.parametrize("body", ["packed", "cmp", "packed4"])
def test_lanes_r_sub_tile_w_invariant(r_sub, tile_w, body):
    pos, vocab = rand_events(30000, 2000, 7, sparse_frac=0.05, skew=True)
    got = np.asarray(
        dense_counts_lanes(pos, vocab, 2000, r_sub=r_sub, tile_w=tile_w,
                           body=body)
    )
    want = dense_counts_host(pos, vocab, 2000)
    np.testing.assert_array_equal(got, want)


def test_lanes_deep_pileup():
    # one very deep position (repeat collapse shape)
    pos = np.concatenate([
        np.full(5000, 17, dtype=np.int64),
        np.arange(300, dtype=np.int64),
    ])
    vocab = (pos % DENSE_V).astype(np.int32)
    got = np.asarray(dense_counts_lanes(pos, vocab, 300))
    want = dense_counts_host(pos, vocab, 300)
    np.testing.assert_array_equal(got, want)


def test_prepare_lanes_layout():
    pos = np.array([0, 0, 1, 129, 129, 129, 500], dtype=np.int64)
    vocab = np.array([1, 2, 3, 4, 5, 6, 7], dtype=np.int32)
    vb, block_tile, n_tiles = prepare_lanes(
        pos, vocab, 512, r_sub=8, tile_w=128
    )
    assert n_tiles == 4
    assert vb.dtype == np.uint8
    assert vb.shape[1] == 128
    # every tile owns at least one block; blocks of a tile are contiguous
    assert set(block_tile.tolist()) >= {0, 1, 2, 3}
    # position 0's two events sit in lane 0 of tile 0's first two rows
    t0 = np.flatnonzero(block_tile == 0)[0]
    assert vb[t0 * 8 + 0, 0] == 1 and vb[t0 * 8 + 1, 0] == 2
    # position 129 = tile 1, lane 1: three events stacked
    t1 = np.flatnonzero(block_tile == 1)[0]
    assert list(vb[t1 * 8: t1 * 8 + 3, 1]) == [4, 5, 6]
    # everything else is the pad byte
    n_real = 7
    assert int((vb != PAD_BYTE).sum()) == n_real


def test_lanes_slab_split(monkeypatch):
    # force multi-slab execution with a tiny slab cap
    monkeypatch.setattr(vote_lanes, "MAX_BLOCKS_PER_CALL", 8)
    pos, vocab = rand_events(20000, 3000, 11, skew=True)
    got = np.asarray(dense_counts_lanes(pos, vocab, 3000, r_sub=8))
    want = dense_counts_host(pos, vocab, 3000)
    np.testing.assert_array_equal(got, want)


def test_lanes_matches_mxu_kernel():
    from polypolish_tpu.ops.vote_pallas import dense_counts_pallas

    pos, vocab = rand_events(15000, 1500, 13, sparse_frac=0.02)
    lanes = np.asarray(dense_counts_lanes(pos, vocab, 1500))
    for variant in ("unfused", "fused", "split"):
        mxu = np.asarray(
            dense_counts_pallas(pos, vocab, 1500, fused=variant)
        )
        np.testing.assert_array_equal(lanes, mxu)


def test_lanes_polisher_slab_uploads():
    """LanesPolisher.vote_counts multi-slab path (slab-wise device_put
    + per-slab kernel + masked accumulate) is bitwise equal to the
    host fold."""
    from polypolish_tpu.models.polisher import LanesPolisher

    pos, vocab = rand_events(40000, 3000, 41, sparse_frac=0.05, skew=True)
    m = LanesPolisher(3000, r_sub=8, tile_w=128)
    m.max_blocks = 8  # force many slabs
    vb, bt, n_tiles = prepare_lanes(pos, vocab, 3000, r_sub=8, tile_w=128)
    assert bt.shape[0] % m.max_blocks == 0
    got = np.asarray(m.vote_counts(vb, bt))[:, :3000]
    want = dense_counts_host(pos, vocab, 3000)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("cap", [False, True])
def test_packed8_nibble_body_matches_host(cap):
    """The packed8 (nibble-wire) body: two events per byte, bitwise
    equal to the host fold (round-5 alternate; sparse bytes >= 8 map to
    nibble 15 and are ignored exactly like the byte layouts)."""
    pos, vocab = rand_events(120_000, 4000, 19, sparse_frac=0.03,
                             skew=True)
    want = dense_counts_host(pos, vocab, 4000)
    got = np.asarray(dense_counts_lanes(
        pos, vocab, 4000, interpret=True, r_sub=8, tile_w=128,
        body="packed8", cap=cap,
    ))
    np.testing.assert_array_equal(got, want)


def test_to_packed8_layout():
    """to_packed8 packs row 8q+k into 4-bit field k; bytes >= 8
    (pad/sparse) become nibble 15."""
    from polypolish_tpu.ops.vote_lanes import to_packed8

    vb = np.full((8, 128), 255, np.uint8)
    vb[0, 0] = 3
    vb[1, 0] = 7
    vb[7, 5] = 100  # sparse byte -> nibble 15
    x = to_packed8(vb, 8).view(np.uint32)
    assert x.shape == (1, 128)
    assert x[0, 0] & 0xF == 3
    assert (x[0, 0] >> 4) & 0xF == 7
    assert (x[0, 5] >> 28) & 0xF == 15
    # all remaining fields are pad (15)
    assert x[0, 1] == 0xFFFFFFFF
