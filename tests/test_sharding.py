"""Multi-device sharding tests on an 8-virtual-device CPU mesh:
sharded vote+consensus must be bitwise identical to the single-device
path for every mesh shape."""

import jax
import numpy as np
import pytest

from polypolish_tpu.ops.consensus import (
    compute_thresholds,
    consensus_dense_numpy,
)
from polypolish_tpu.ops.vote import dense_counts_host, depth_host
from polypolish_tpu.parallel import (
    bucket_events_for_mesh,
    make_mesh,
    mesh_shape_for,
    sharded_vote_consensus,
)
from polypolish_tpu.vocab import DENSE_V


def _case(seed, n_events=20000, num_positions=3000):
    rng = np.random.default_rng(seed)
    pos = rng.integers(0, num_positions, size=n_events).astype(np.int64)
    vocab = rng.integers(0, 10, size=n_events).astype(np.int32)
    weight = rng.choice([1.0, 0.5, 1 / 3], size=n_events)
    orig_id = rng.integers(1, 5, size=num_positions).astype(np.int32)
    return pos, vocab, weight, orig_id


def test_mesh_shape_for():
    assert mesh_shape_for(1) == (1, 1)
    assert mesh_shape_for(2) == (2, 1)
    assert mesh_shape_for(4) == (2, 2)
    assert mesh_shape_for(8) == (2, 4)
    assert mesh_shape_for(8, prefer_pos=8) == (1, 8)
    with pytest.raises(ValueError):
        mesh_shape_for(8, prefer_pos=3)


def test_bucket_events_covers_all():
    pos, vocab, _, _ = _case(0)
    ev_pos, ev_vocab, p_shard = bucket_events_for_mesh(pos, vocab, 3000, 2, 4)
    n_dense = int((vocab < DENSE_V).sum())
    assert int((ev_pos < p_shard).sum()) == n_dense
    assert ev_pos.shape[:2] == (2, 4)


@pytest.mark.parametrize("mesh_shape", [(1, 1), (8, 1), (1, 8), (2, 4), (4, 2)])
@pytest.mark.parametrize("seed", [0, 1])
def test_sharded_equals_single_device(mesh_shape, seed):
    n_data, n_pos = mesh_shape
    devices = jax.devices()[: n_data * n_pos]
    mesh = make_mesh(n_data, n_pos, devices=devices)

    num_positions = 3000
    pos, vocab, weight, orig_id = _case(seed, num_positions=num_positions)
    depth = depth_host(pos, weight, num_positions)
    valid_thr, invalid_thr, low_depth = compute_thresholds(depth, 5, 0.5, 0.2)

    # single-device reference
    counts_ref = dense_counts_host(pos, vocab, num_positions)
    new_id_ref, status_ref = consensus_dense_numpy(
        counts_ref, valid_thr, invalid_thr, low_depth, orig_id
    )

    counts, new_id, status = sharded_vote_consensus(
        mesh, pos, vocab, num_positions,
        valid_thr, invalid_thr, low_depth, orig_id,
    )
    np.testing.assert_array_equal(counts, counts_ref)
    np.testing.assert_array_equal(new_id, new_id_ref)
    np.testing.assert_array_equal(status, status_ref)


def test_sharded_empty_events():
    mesh = make_mesh(2, 4)
    num_positions = 100
    pos = np.empty(0, dtype=np.int64)
    vocab = np.empty(0, dtype=np.int32)
    valid_thr = np.full(num_positions, 5, dtype=np.int32)
    invalid_thr = np.full(num_positions, 1, dtype=np.int32)
    low_depth = np.ones(num_positions, dtype=bool)
    orig_id = np.full(num_positions, 1, dtype=np.int32)
    counts, new_id, status = sharded_vote_consensus(
        mesh, pos, vocab, num_positions,
        valid_thr, invalid_thr, low_depth, orig_id,
    )
    assert counts.sum() == 0
    np.testing.assert_array_equal(new_id, orig_id)


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_sharded_lanes_matches_host(mesh_shape):
    """Round-3 flagship multi-chip path: lanes kernel per shard + exact
    integer psum must be bitwise equal to the single-device host fold
    across mesh shapes."""
    from polypolish_tpu.parallel import make_mesh, sharded_vote_consensus_lanes

    rng = np.random.default_rng(23)
    P = 5000
    n_ev = 60_000
    pos = rng.integers(0, P, n_ev).astype(np.int64)
    vocab = rng.integers(0, DENSE_V + 3, n_ev).astype(np.int32)
    weight = np.ones(n_ev)
    depth = depth_host(pos, weight, P)
    valid_thr, invalid_thr, low_depth = compute_thresholds(depth, 5, 0.5, 0.2)
    orig_id = rng.integers(1, 5, P).astype(np.int32)

    counts_ref = dense_counts_host(pos, vocab, P)
    new_id_ref, status_ref = consensus_dense_numpy(
        counts_ref, valid_thr, invalid_thr, low_depth, orig_id
    )
    mesh = make_mesh(*mesh_shape)
    counts, new_id, status = sharded_vote_consensus_lanes(
        mesh, pos, vocab, P, valid_thr, invalid_thr, low_depth, orig_id
    )
    np.testing.assert_array_equal(counts, counts_ref)
    np.testing.assert_array_equal(new_id, new_id_ref)
    np.testing.assert_array_equal(status, status_ref)


def test_numpy_mesh_packer_uint8_branch():
    """The vectorised numpy mesh packer's plain-uint8 layout (body !=
    packed4) must drive the lanes step to the same counts as the host
    fold (the packed4 branch is covered by the e2e lanes tests)."""
    import jax.numpy as jnp

    from polypolish_tpu.parallel import make_mesh
    from polypolish_tpu.parallel.shard import (
        bucket_lanes_for_mesh,
        make_sharded_polish_step_lanes,
    )

    rng = np.random.default_rng(5)
    P = 3000
    pos = rng.integers(0, P, 40_000).astype(np.int64)
    vocab = rng.integers(0, DENSE_V, 40_000).astype(np.int32)
    counts_ref = dense_counts_host(pos, vocab, P)

    n_data, n_pos = 2, 4
    r_sub, tile_w = 8, 128
    vb, bt, p_shard, n_tiles = bucket_lanes_for_mesh(
        pos, vocab, P, n_data, n_pos, r_sub=r_sub, tile_w=tile_w,
        body="packed",
    )
    assert vb.dtype == np.uint8
    mesh = make_mesh(n_data, n_pos)
    p_total = p_shard * n_pos
    i32max = np.int32(2**31 - 1)
    step = make_sharded_polish_step_lanes(
        mesh, p_shard, n_tiles, r_sub=r_sub, tile_w=tile_w, body="packed",
    )
    counts, _n, _s = step(
        jnp.asarray(vb.view(np.int8)), jnp.asarray(bt),
        jnp.asarray(np.full(p_total, i32max, np.int32)),
        jnp.asarray(np.full(p_total, i32max, np.int32)),
        jnp.asarray(np.ones(p_total, bool)),
        jnp.asarray(np.zeros(p_total, np.int32)),
    )
    np.testing.assert_array_equal(np.array(counts)[:, :P], counts_ref)
