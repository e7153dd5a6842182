"""Compiled-kernel correctness gate on REAL TPU hardware (VERDICT r4
item 2).

The rest of the suite runs the Pallas kernels in interpret mode on CPU
(tests/conftest.py forces the cpu platform), so a Mosaic LOWERING
regression — this environment has known int8 gaps — would pass all CPU
tests and only surface in bench.py's inline bitwise check.  These tests
make compiled (interpret=False) kernel correctness a pytest gate:

    POLYPOLISH_TPU_CHIP_TESTS=1 python -m pytest tests -m tpu

conftest.py skips its CPU forcing when POLYPOLISH_TPU_CHIP_TESTS is
set, so the session sees the attached chip; without a chip (or without
the env var) every test here auto-skips.  bench.py runs this selection
in the bench session before capturing the kernel numbers, so a
lowering regression fails pytest on a TPU host rather than silently
shipping a wrong benchmark.

Spec: pileup.rs:56-65 exactness — kernel counts must be bitwise equal
to the host fold on every workload.
"""

import numpy as np
import pytest

from polypolish_tpu.ops import vote_lanes
from polypolish_tpu.ops.vote import dense_counts_host
from polypolish_tpu.ops.vote_lanes import dense_counts_lanes, prepare_lanes
from polypolish_tpu.vocab import DENSE_V


def _chip_attached() -> bool:
    try:
        import jax

        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        not _chip_attached(),
        reason="no TPU attached (or conftest forced CPU; set "
        "POLYPOLISH_TPU_CHIP_TESTS=1 to run on the chip)",
    ),
]


def rand_events(n, num_positions, seed, sparse_frac=0.0, skew=False):
    rng = np.random.default_rng(seed)
    if skew:
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


# One shared geometry so the variants reuse compiled graphs where
# possible (first remote compile of a shape can take minutes on a
# tunnel-attached chip; the persistent compile cache amortises reruns).
P = 4 * vote_lanes.TILE_W  # 8192 positions
N = 300_000


def test_chip_packed4_bitwise():
    """The flagship packed4 body, compiled (the production device
    path's kernel)."""
    pos, vocab = rand_events(N, P, seed=101, sparse_frac=0.02, skew=True)
    got = np.asarray(dense_counts_lanes(
        pos, vocab, P, interpret=False, body="packed4"))
    want = dense_counts_host(pos, vocab, P)
    np.testing.assert_array_equal(got, want)


def test_chip_capped_layout_bitwise():
    """Depth-stratified cap layout + overflow scatter-add, compiled
    (the upload-bound device-path layout since round 4)."""
    pos, vocab = rand_events(N, P, seed=103, sparse_frac=0.02, skew=True)
    got = np.asarray(dense_counts_lanes(
        pos, vocab, P, interpret=False, body="packed4", cap=True))
    want = dense_counts_host(pos, vocab, P)
    np.testing.assert_array_equal(got, want)


def test_chip_slabbed_stream_bitwise(monkeypatch):
    """Multi-slab execution (long block streams split at
    MAX_BLOCKS_PER_CALL, tile-straddle re-zeroing) compiled on chip."""
    monkeypatch.setattr(vote_lanes, "MAX_BLOCKS_PER_CALL", 8)
    pos, vocab = rand_events(60_000, P, seed=105, skew=True)
    got = np.asarray(dense_counts_lanes(
        pos, vocab, P, interpret=False, body="packed4"))
    want = dense_counts_host(pos, vocab, P)
    np.testing.assert_array_equal(got, want)


def test_chip_mesh_spmd_step_bitwise():
    """The sharded SPMD polish step (shard_map + lanes kernel + exact
    int psum) compiled on the real device mesh (1 chip -> (1,1) mesh;
    the lowering includes the collective)."""
    import jax.numpy as jnp

    from polypolish_tpu.parallel import make_mesh
    from polypolish_tpu.parallel.shard import make_sharded_polish_step_lanes

    pos, vocab = rand_events(N, P, seed=107, sparse_frac=0.02, skew=True)
    want = dense_counts_host(pos, vocab, P)

    r_sub, tile_w = vote_lanes.R_SUB, vote_lanes.TILE_W
    vb, bt, n_tiles = prepare_lanes(pos, vocab, P, r_sub, tile_w)
    vb4 = vote_lanes.to_packed4(vb, r_sub)

    mesh = make_mesh(1, 1)
    i32max = np.int32(2**31 - 1)
    step = make_sharded_polish_step_lanes(
        mesh, P, n_tiles, r_sub=r_sub, tile_w=tile_w, body="packed4",
    )
    counts, _new_id, _status = step(
        jnp.asarray(vb4[None, None]), jnp.asarray(bt[None, None]),
        jnp.asarray(np.full(P, i32max, np.int32)),
        jnp.asarray(np.full(P, i32max, np.int32)),
        jnp.asarray(np.ones(P, bool)),
        jnp.asarray(np.zeros(P, np.int32)),
    )
    np.testing.assert_array_equal(np.array(counts)[:, :P], want)


def test_chip_polisher_forward_pack_bitwise(tmp_path):
    """LanesPolisher.forward_pack — the full device step the windowed
    path runs (vote kernel + on-device consensus + uint8 decision
    fetch) — compiled, against the host fold + host consensus."""
    import jax.numpy as jnp

    from polypolish_tpu.models.polisher import LanesPolisher

    pos, vocab = rand_events(N, P, seed=109, skew=True)
    want = dense_counts_host(pos, vocab, P)

    m = LanesPolisher(P)
    vb, bt, n_tiles = prepare_lanes(
        pos, vocab, P, m.r_sub, m.tile_w)
    i32max = np.int32(2**31 - 1)
    counts, _adopted, _status = m.forward_pack(
        vote_lanes.to_packed4(vb, m.r_sub) if m.body == "packed4"
        else vb.view(np.int8),
        bt,
        jnp.asarray(np.full(P, i32max, np.int32)),
        jnp.asarray(np.full(P, i32max, np.int32)),
        jnp.asarray(np.ones(P, bool)),
        jnp.asarray(np.zeros(P, np.int32)),
    )
    np.testing.assert_array_equal(np.asarray(counts)[:, :P], want)


def test_chip_mxu_variant_bitwise():
    """The MXU (one-hot matmul) fallback kernel family, compiled."""
    from polypolish_tpu.ops.vote_pallas import dense_counts_pallas

    pos, vocab = rand_events(100_000, 1536, seed=111, sparse_frac=0.02)
    want = dense_counts_host(pos, vocab, 1536)
    got = np.asarray(dense_counts_pallas(
        pos, vocab, 1536, interpret=False, fused="fused"))
    np.testing.assert_array_equal(got, want)


def test_chip_capped_mxu_overflow_bitwise(monkeypatch):
    """The production kernel config since round 5 — cap layout + MXU
    chunks overflow (173 G votes/s vs 144 G uncapped / 56 G with the
    XLA scatter) — compiled, bitwise vs the host fold."""
    from polypolish_tpu.models.polisher import LanesPolisher
    from polypolish_tpu.ops.vote_lanes import prepare_lanes

    monkeypatch.setenv("POLYPOLISH_TPU_OV_MODE", "mxu")
    pos, vocab = rand_events(N, P, seed=113, skew=True)
    want = dense_counts_host(pos, vocab, P)
    m = LanesPolisher(P)
    packed = prepare_lanes(pos, vocab, P, m.r_sub, m.tile_w, cap=True)
    vb, bt, n_tiles, ov_pos, ov_vid = packed
    got = np.asarray(m.vote_counts(vb, bt, ov_pos, ov_vid))[:, :P]
    np.testing.assert_array_equal(got, want)


def test_chip_packed8_nibble_body_bitwise():
    """The packed8 nibble-wire body compiled on chip (round-5 alternate:
    ~0.5 B/event wire format; measured 145 G votes/s capped vs
    packed4's 173 G — kept as the upload-lean alternate)."""
    pos, vocab = rand_events(N, P, seed=115, sparse_frac=0.02, skew=True)
    want = dense_counts_host(pos, vocab, P)
    got = np.asarray(dense_counts_lanes(
        pos, vocab, P, interpret=False, body="packed8", r_sub=64))
    np.testing.assert_array_equal(got, want)
