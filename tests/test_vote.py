"""Vote accumulation backends must agree exactly; depth must replicate
sequential stream-order f64 addition."""

import numpy as np
import pytest

from polypolish_tpu.ops.vote import (
    count_votes,
    dense_counts_host,
    dense_counts_xla,
    depth_host,
    sparse_counts_host,
)
from polypolish_tpu.vocab import DENSE_V


def _random_events(rng, n_events, num_positions, num_vocab=12):
    pos = rng.integers(0, num_positions, size=n_events).astype(np.int64)
    vocab = rng.integers(0, num_vocab, size=n_events).astype(np.int32)
    weight = rng.choice([1.0, 0.5, 1 / 3, 0.25], size=n_events)
    return pos, vocab, weight


@pytest.mark.parametrize("seed", [0, 1])
def test_host_vs_xla_counts(seed):
    rng = np.random.default_rng(seed)
    pos, vocab, weight = _random_events(rng, 5000, 337)
    host = dense_counts_host(pos, vocab, 337)
    xla = np.asarray(dense_counts_xla(pos.astype(np.int32), vocab, 337))
    np.testing.assert_array_equal(host, xla)
    assert host.shape == (DENSE_V, 337)


def test_depth_is_sequential_stream_order():
    # Construct a case where summation order matters in f64:
    # adding 1/3 fifteen times sequentially != 15 * (1/3).
    w = 1.0 / 3.0
    pos = np.zeros(15, dtype=np.int64)
    weight = np.full(15, w)
    depth = depth_host(pos, weight, 1)
    expected = 0.0
    for _ in range(15):
        expected += w
    assert depth[0] == expected  # bitwise-equal sequential sum
    assert depth[0] != 15 * w or expected == 15 * w


def test_depth_interleaved_positions():
    rng = np.random.default_rng(3)
    pos = rng.integers(0, 50, size=4000)
    weight = rng.choice([1.0, 0.5, 1 / 3, 0.2], size=4000)
    depth = depth_host(pos, weight, 50)
    # sequential per-position reference
    expected = np.zeros(50)
    for p, w in zip(pos, weight):
        expected[p] += w
    np.testing.assert_array_equal(depth, expected)


def test_sparse_counts():
    pos = np.array([5, 5, 5, 9, 2], dtype=np.int64)
    vocab = np.array([8, 8, 9, 10, 3], dtype=np.int32)
    sp, sv, sc = sparse_counts_host(pos, vocab)
    assert list(zip(sp.tolist(), sv.tolist(), sc.tolist())) == [
        (5, 8, 2), (5, 9, 1), (9, 10, 1),
    ]


def test_count_votes_combined():
    rng = np.random.default_rng(4)
    pos, vocab, weight = _random_events(rng, 2000, 101, num_vocab=10)
    counts, depth, (sp, sv, sc) = count_votes(pos, vocab, weight, 101, "host")
    # dense + sparse must partition all events
    assert counts.sum() + sc.sum() == 2000
    assert depth.shape == (101,)
    counts_x, depth_x, _ = count_votes(pos, vocab, weight, 101, "xla")
    np.testing.assert_array_equal(counts, counts_x)
    np.testing.assert_array_equal(depth, depth_x)
