"""Vote accumulation: event stream -> (8, P) dense count tensor + f64 depth.

Replaces the reference's per-base ``PileupBase::add_seq`` hot loop
(pileup.rs:56-65) with array passes:

- **depth** (f64, order-sensitive): ``np.bincount(pos, weights=w)`` is a
  sequential C loop over the event stream, performing exactly the same
  f64 additions in exactly the same order as the reference — bit-exact
  parity, kept on the host (TPUs have no f64).
- **dense counts** (integers, exactly associative): scatter-add on
  device.  Three interchangeable backends:
    * ``host``   — numpy bincount (always available, used for tests)
    * ``xla``    — jnp scatter-add under jit
    * ``pallas`` — one-hot-matmul MXU kernel (ops/vote_pallas.py)
- **sparse counts** (vocab ids >= 8; rare multi-base insertions):
  host-side unique/count, mirroring the reference's HashMap tier.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from polypolish_tpu.vocab import DENSE_V

SparseCounts = Tuple[np.ndarray, np.ndarray, np.ndarray]  # (pos, vocab_id, count)


def depth_host(pos: np.ndarray, weight: np.ndarray, num_positions: int) -> np.ndarray:
    """Per-position f64 depth, sequential in stream order (bit-exact)."""
    if pos.size == 0:
        return np.zeros(num_positions, dtype=np.float64)
    return np.bincount(pos, weights=weight, minlength=num_positions)


def dense_counts_host(
    pos: np.ndarray, vocab: np.ndarray, num_positions: int
) -> np.ndarray:
    """(8, P) int32 dense-tier counts via numpy bincount.

    One bincount per vocab row: peak temporary memory is O(P) instead of
    the O(8P) int64 a flattened-key bincount would allocate (matters at
    the 100 Mb-contig scale)."""
    counts = np.zeros((DENSE_V, num_positions), dtype=np.int32)
    for v in range(DENSE_V):
        vpos = pos[vocab == v]
        if vpos.size:
            counts[v] = np.bincount(vpos, minlength=num_positions).astype(
                np.int32, copy=False
            )
    return counts


@functools.partial(jax.jit, static_argnames=("num_positions",))
def dense_counts_xla(pos, vocab, num_positions: int):
    """(8, P) int32 dense counts via XLA scatter-add.

    Sparse-tier and padding events are dropped by routing them to
    position -1 with mode='drop'.  Pad events with vocab = -1 (or any
    id >= DENSE_V).
    """
    ok = (vocab >= 0) & (vocab < DENSE_V) & (pos >= 0)
    # Dropped events are routed to an out-of-range *positive* index:
    # negative indices would wrap Python-style instead of being dropped.
    p = jnp.where(ok, pos, num_positions).astype(jnp.int32)
    v = jnp.where(ok, vocab, 0).astype(jnp.int32)
    counts = jnp.zeros((DENSE_V, num_positions), jnp.int32)
    return counts.at[v, p].add(1, mode="drop")


def sparse_counts_host(
    pos: np.ndarray, vocab: np.ndarray
) -> SparseCounts:
    """Host counts for sparse-tier events (vocab id >= DENSE_V)."""
    mask = vocab >= DENSE_V
    spos = pos[mask]
    sv = vocab[mask]
    if spos.size == 0:
        empty = np.empty((0,), dtype=np.int64)
        return empty, empty, empty
    keys = spos.astype(np.int64) * (2**31) + sv.astype(np.int64)
    uk, cnt = np.unique(keys, return_counts=True)
    return uk // (2**31), uk % (2**31), cnt


def count_votes(
    pos: np.ndarray,
    vocab: np.ndarray,
    weight: np.ndarray,
    num_positions: int,
    backend: str = "host",
) -> Tuple[np.ndarray, np.ndarray, SparseCounts]:
    """Full vote accumulation for one contig.

    Returns (dense_counts (8,P) int32, depth (P,) f64, sparse_counts).
    """
    depth = depth_host(pos, weight, num_positions)
    sparse = sparse_counts_host(pos, vocab)
    if backend == "host":
        counts = dense_counts_host(pos, vocab, num_positions)
    elif backend == "xla":
        counts = np.asarray(
            dense_counts_xla(
                jnp.asarray(pos, jnp.int32), jnp.asarray(vocab, jnp.int32),
                num_positions,
            )
        )
    elif backend == "pallas":
        from polypolish_tpu.ops.vote_pallas import dense_counts_pallas

        counts = np.asarray(dense_counts_pallas(pos, vocab, num_positions))
    else:
        raise ValueError(f"unknown vote backend: {backend}")
    return counts, depth, sparse
