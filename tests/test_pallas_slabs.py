"""Slabbed pallas_call path: streams longer than MAX_CHUNKS_PER_CALL
are split into equal slabs whose partial count tensors sum exactly
(SMEM holds only 1 MB of scalar-prefetch tile map on v5e — a 4.6 Mb
genome at 50x produces a ~225k-chunk stream whose map alone is ~1 MB).
"""

import numpy as np
import pytest

from polypolish_tpu.ops import vote_pallas
from polypolish_tpu.ops.vote import dense_counts_host
from polypolish_tpu.ops.vote_pallas import dense_counts_pallas


def _random_events(rng, n, p):
    pos = rng.integers(0, p, size=n).astype(np.int64)
    vocab = rng.integers(0, 8, size=n).astype(np.int32)
    return pos, vocab


@pytest.mark.parametrize("variant", ["fused", "unfused", "split"])
def test_slabbed_call_matches_host(monkeypatch, variant):
    """Force tiny slabs so the slab loop runs in interpret mode; counts
    must be bitwise-equal to host (tiles straddling slab boundaries are
    re-zeroed per slab and the partials summed)."""
    monkeypatch.setattr(vote_pallas, "MAX_CHUNKS_PER_CALL", 16)
    rng = np.random.default_rng(21)
    pos, vocab = _random_events(rng, 60_000, 6000)  # ~24 tiles, >48 chunks
    host = dense_counts_host(pos, vocab, 6000)
    out = np.asarray(dense_counts_pallas(
        pos, vocab, 6000, interpret=True, fused=variant,
    ))
    assert np.array_equal(out, host)


def test_slab_padding_multiple(monkeypatch):
    monkeypatch.setattr(vote_pallas, "MAX_CHUNKS_PER_CALL", 16)
    rng = np.random.default_rng(22)
    pos, vocab = _random_events(rng, 30_000, 4000)
    cp, cv, ct, n_tiles = vote_pallas.prepare_chunks(
        pos, vocab, 4000, use_native=False
    )
    n_chunks = ct.shape[0]
    assert n_chunks % 16 == 0


def test_native_chunk_padding_matches_slab_rule():
    """pp_chunks_from_runs pads big streams to the 32768 multiple (the
    compiled-in kMaxChunksPerCall must equal MAX_CHUNKS_PER_CALL)."""
    assert vote_pallas.MAX_CHUNKS_PER_CALL == 32768
