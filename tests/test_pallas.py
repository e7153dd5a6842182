"""Pallas vote kernel: must agree exactly with the host bincount path.

Runs in interpreter mode on CPU; on a real TPU the same kernel is
compiled (see bench.py).
"""

import numpy as np
import pytest

from polypolish_tpu.ops.vote import dense_counts_host
from polypolish_tpu.ops.vote_pallas import (
    E_B,
    E_LANE,
    E_SUB,
    TILE_P,
    dense_counts_pallas,
    prepare_chunks,
)
from polypolish_tpu.vocab import DENSE_V


def _random_events(rng, n_events, num_positions, num_vocab=12):
    pos = rng.integers(0, num_positions, size=n_events).astype(np.int64)
    vocab = rng.integers(0, num_vocab, size=n_events).astype(np.int32)
    return pos, vocab


def test_prepare_chunks_structure():
    rng = np.random.default_rng(0)
    pos, vocab = _random_events(rng, 3000, 1200)
    chunk_pos, chunk_vocab, chunk_tile, n_tiles = prepare_chunks(pos, vocab, 1200)
    assert n_tiles == -(-1200 // TILE_P)
    assert chunk_pos.shape == chunk_vocab.shape
    assert chunk_pos.shape[1] == E_LANE
    assert chunk_tile.shape[0] * E_SUB == chunk_pos.shape[0]
    # chunk_tile must be non-decreasing (consecutive revisits)
    assert (np.diff(chunk_tile) >= 0).all()
    # every tile appears at least once
    assert set(chunk_tile.tolist()) == set(range(n_tiles))
    # pad entries have pos -1; real entries land inside their tile
    n_dense = int(((vocab < DENSE_V) & (vocab >= 0)).sum())
    assert int((chunk_pos >= 0).sum()) == n_dense
    real = chunk_pos >= 0
    assert chunk_pos[real].max() < TILE_P


@pytest.mark.parametrize("seed,n_events,num_positions", [
    (0, 5000, 700),
    (1, 20000, 2048),
    (2, 100, 3000),   # sparse coverage: many empty tiles
    (3, 0, 600),      # no events at all
    (4, 4096, 512),   # exactly one tile
])
def test_pallas_matches_host(seed, n_events, num_positions):
    rng = np.random.default_rng(seed)
    pos, vocab = _random_events(rng, n_events, num_positions)
    host = dense_counts_host(pos, vocab, num_positions)
    pallas = np.asarray(
        dense_counts_pallas(pos, vocab, num_positions, interpret=True)
    )
    np.testing.assert_array_equal(host, pallas)


@pytest.mark.parametrize("tile_p,e_sub", [(128, 8), (256, 16), (512, 32), (1024, 8)])
def test_pallas_tiling_configs(tile_p, e_sub):
    rng = np.random.default_rng(10)
    pos, vocab = _random_events(rng, 8000, 900)
    host = dense_counts_host(pos, vocab, 900)
    out = np.asarray(
        dense_counts_pallas(
            pos, vocab, 900, interpret=True, tile_p=tile_p, e_sub=e_sub
        )
    )
    np.testing.assert_array_equal(host, out)


def test_prepare_chunks_native_matches_numpy():
    from polypolish_tpu.native import loader

    if not loader.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(13)
    for num_positions, n_events in ((900, 8000), (5000, 0), (300, 50000)):
        pos, vocab = _random_events(rng, n_events, num_positions)
        a = prepare_chunks(pos, vocab, num_positions, use_native=False)
        b = prepare_chunks(pos, vocab, num_positions, use_native=True)
        assert a[3] == b[3]
        for x, y in zip(a[:3], b[:3]):
            np.testing.assert_array_equal(x, y)


def test_pallas_int8_variant():
    rng = np.random.default_rng(11)
    pos, vocab = _random_events(rng, 8000, 900)
    host = dense_counts_host(pos, vocab, 900)
    out = np.asarray(
        dense_counts_pallas(pos, vocab, 900, interpret=True, use_int8=True)
    )
    np.testing.assert_array_equal(host, out)


@pytest.mark.parametrize("k", [2, 4])
def test_pallas_chunks_per_step(k):
    from polypolish_tpu.ops.vote_pallas import _vote_pallas_jit
    import jax.numpy as jnp

    rng = np.random.default_rng(14)
    pos, vocab = _random_events(rng, 20000, 1500)
    host = dense_counts_host(pos, vocab, 1500)
    chunk_pos, chunk_vocab, chunk_tile, n_tiles = prepare_chunks(
        pos, vocab, 1500, chunk_multiple=k
    )
    assert chunk_tile.shape[0] % k == 0
    out = np.asarray(_vote_pallas_jit(
        jnp.asarray(chunk_pos), jnp.asarray(chunk_vocab),
        jnp.asarray(chunk_tile), n_tiles=n_tiles, interpret=True,
        chunks_per_step=k,
    ))[:, :1500]
    np.testing.assert_array_equal(host, out)


def test_pallas_heavy_single_position():
    # one position receiving thousands of votes (deep pileup)
    pos = np.zeros(5000, dtype=np.int64)
    vocab = np.full(5000, 2, dtype=np.int32)
    out = np.asarray(dense_counts_pallas(pos, vocab, 100, interpret=True))
    assert out[2, 0] == 5000
    assert out.sum() == 5000


@pytest.mark.parametrize("use_int8", [False, True])
def test_pallas_fused_matches_unfused(use_int8):
    """Every kernel variant ('unfused', 'fused', 'split') must produce
    bit-identical counts (all match host)."""
    from polypolish_tpu.ops.vote_pallas import _KERNEL_MAKERS

    rng = np.random.default_rng(9)
    pos, vocab = _random_events(rng, 30000, 2500)
    host = dense_counts_host(pos, vocab, 2500)
    for variant in _KERNEL_MAKERS:
        out = np.asarray(dense_counts_pallas(
            pos, vocab, 2500, interpret=True, use_int8=use_int8,
            fused=variant,
        ))
        assert np.array_equal(out, host), (variant, use_int8)


def test_pallas_fused_chunks_per_step():
    """fused + chunks_per_step>1 (K = e_sub*k*128 per grid step)."""
    from polypolish_tpu.ops.vote_pallas import (
        _vote_pallas_call, prepare_chunks,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(10)
    pos, vocab = _random_events(rng, 12000, 1500)
    host = dense_counts_host(pos, vocab, 1500)
    cp, cv, ct, n_tiles = prepare_chunks(
        pos, vocab, 1500, chunk_multiple=2
    )
    out = np.asarray(_vote_pallas_call(
        jnp.asarray(cp), jnp.asarray(cv), jnp.asarray(ct),
        n_tiles=n_tiles, interpret=True, chunks_per_step=2, fused=True,
    ))[:, :1500]
    assert np.array_equal(out, host)


def test_prepare_chunks_native_thread_invariant():
    """The parallel counting sort must produce a bit-identical chunk
    layout for every thread count (contiguous input ranges + per-thread
    per-tile prefix offsets preserve the stable order)."""
    from polypolish_tpu.native import binding, loader

    if not loader.available():
        pytest.skip("native unavailable")
    rng = np.random.default_rng(31)
    pos, vocab = _random_events(rng, 250_000, 40_000)
    ref = None
    for nt in (1, 2, 3, 8):
        out = binding.prepare_chunks_native(
            pos, vocab, 40_000, 256, 8, n_threads=nt
        )
        if ref is None:
            ref = out
        else:
            assert out[3] == ref[3]
            for a, b in zip(ref[:3], out[:3]):
                assert np.array_equal(a, b), f"n_threads={nt}"
