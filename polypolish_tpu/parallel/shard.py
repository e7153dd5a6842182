"""SPMD vote + consensus over a ('data', 'pos') mesh via shard_map.

Design (no reference counterpart — the reference is a serial binary):

- The host buckets vote events by position shard (events are position-
  local, so routing is a stable sort — no halo exchange is needed at
  all, unlike stencil workloads).
- Each device scatter-adds its (data-batch x position-range) events
  into a local (8, P_shard) int32 count tile.
- Counts are merged with an exact integer ``psum`` over the 'data' axis
  (associative -> bitwise identical to the single-device result).
- The consensus decision runs elementwise on each position shard, fully
  parallel, producing position-sharded (new_id, status).

Thresholds stay host-computed f64 (see ops/consensus.py) and are fed in
position-sharded.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 public API
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(f, mesh, in_specs, out_specs, check_vma: bool = True):
    try:
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_vma,
        )
    except TypeError:  # older jax: the flag was called check_rep
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=check_vma,
        )

from polypolish_tpu.ops.consensus import consensus_dense_core
from polypolish_tpu.vocab import DENSE_V


def bucket_events_for_mesh(
    pos: np.ndarray,
    vocab: np.ndarray,
    num_positions: int,
    n_data: int,
    n_pos: int,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Route dense-tier events to (data, pos) shards.

    Returns (ev_pos (n_data, n_pos, E) int32 with local positions and
    pad = p_shard, ev_vocab likewise, p_shard).  Events are split
    round-robin over the data axis and by position range over the pos
    axis; padding events use local position == p_shard which the
    scatter drops.
    """
    mask = (vocab >= 0) & (vocab < DENSE_V) & (pos >= 0) & (pos < num_positions)
    pos = np.asarray(pos[mask], dtype=np.int64)
    vocab = np.asarray(vocab[mask], dtype=np.int32)

    p_shard = -(-num_positions // n_pos)
    p_shard = max(8, p_shard)
    shard_of = pos // p_shard
    data_of = np.arange(pos.size, dtype=np.int64) % n_data

    # per (data, pos-shard) bucket sizes -> common padded length E
    bucket = data_of * n_pos + shard_of
    counts = np.bincount(bucket, minlength=n_data * n_pos)
    e_max = max(8, int(counts.max()) if counts.size else 8)

    ev_pos = np.full((n_data, n_pos, e_max), p_shard, dtype=np.int32)
    ev_vocab = np.zeros((n_data, n_pos, e_max), dtype=np.int32)
    order = np.argsort(bucket, kind="stable")
    sorted_bucket = bucket[order]
    start = np.concatenate(([0], np.cumsum(counts)))[:-1]
    within = np.arange(pos.size) - start[sorted_bucket]
    flat_idx = sorted_bucket * e_max + within
    ev_pos.reshape(-1)[flat_idx] = (pos[order] - shard_of[order] * p_shard).astype(
        np.int32
    )
    ev_vocab.reshape(-1)[flat_idx] = vocab[order]
    return ev_pos, ev_vocab, p_shard


def _local_counts(ev_pos, ev_vocab, p_shard: int):
    """Scatter local events into an (8, p_shard) tile; pad events carry
    local position == p_shard and fall off the end (mode='drop')."""
    pos = ev_pos.reshape(-1)
    voc = ev_vocab.reshape(-1)
    counts = jnp.zeros((DENSE_V, p_shard), jnp.int32)
    return counts.at[voc, pos].add(1, mode="drop")


def make_sharded_polish_step(mesh: Mesh, p_shard: int):
    """Build the jitted SPMD step for a given mesh and position-shard
    size.  Signature of the returned function:

      step(ev_pos (D,S,E), ev_vocab (D,S,E),
           valid_thr (P,), invalid_thr (P,), low_depth (P,), orig_id (P,))
        -> (counts (8,P) int32, new_id (P,) int32, status (P,) int32)

    where P = S * p_shard.  Counts/new_id/status are position-sharded;
    the integer psum over 'data' makes them bitwise equal to the
    single-device result.
    """

    def local_step(ev_pos, ev_vocab, valid_thr, invalid_thr, low_depth, orig_id):
        counts = _local_counts(ev_pos, ev_vocab, p_shard)
        counts = jax.lax.psum(counts, "data")
        new_id, status = consensus_dense_core(
            counts, valid_thr, invalid_thr, low_depth, orig_id
        )
        return counts, new_id, status

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P("data", "pos", None),
            P("data", "pos", None),
            P("pos"),
            P("pos"),
            P("pos"),
            P("pos"),
        ),
        out_specs=(P(None, "pos"), P("pos"), P("pos")),
    )
    return jax.jit(sharded)


def sharded_vote_consensus(
    mesh: Mesh,
    pos: np.ndarray,
    vocab: np.ndarray,
    num_positions: int,
    valid_thr: np.ndarray,
    invalid_thr: np.ndarray,
    low_depth: np.ndarray,
    orig_id: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """End-to-end sharded vote+consensus for one contig.

    Host-side convenience wrapper: buckets events, pads the position
    axis to the shard grid, runs the SPMD step, and trims the outputs
    back to num_positions.  Returns (counts, new_id, status) as numpy.
    """
    n_data, n_pos = mesh.devices.shape
    ev_pos, ev_vocab, p_shard = bucket_events_for_mesh(
        pos, vocab, num_positions, n_data, n_pos
    )
    p_total = p_shard * n_pos

    def pad_p(arr, fill):
        out = np.full(p_total, fill, dtype=arr.dtype)
        out[: arr.shape[0]] = arr
        return out

    step = make_sharded_polish_step(mesh, p_shard)
    counts, new_id, status = step(
        jnp.asarray(ev_pos),
        jnp.asarray(ev_vocab),
        jnp.asarray(pad_p(np.asarray(valid_thr, np.int32), 2**31 - 1)),
        jnp.asarray(pad_p(np.asarray(invalid_thr, np.int32), 2**31 - 1)),
        jnp.asarray(pad_p(np.asarray(low_depth, bool), True)),
        jnp.asarray(pad_p(np.asarray(orig_id, np.int32), 0)),
    )
    return (
        np.array(counts)[:, :num_positions],
        np.array(new_id)[:num_positions],
        np.array(status)[:num_positions],
    )


def bucket_lanes_for_mesh(
    pos: np.ndarray,
    vocab: np.ndarray,
    num_positions: int,
    n_data: int,
    n_pos: int,
    r_sub: Optional[int] = None,
    tile_w: Optional[int] = None,
    body: str = "packed4",
):
    """Route events to (data, pos) shards and pack each shard into the
    lane-aligned layout (ops/vote_lanes.py), padded to a common block
    count — fully vectorised (no per-(d,s) Python loop; the production
    path uses the one-call native twin ``pp_lanes_mesh``, this numpy
    packer is the no-native fallback and test oracle).

    Returns (vb, block_tile (D, S, B) int32, p_shard, n_tiles) with vb
    in the packed4 layout — (D, S, B*r_sub//4, tile_w) int32, four
    byte-rows per int32 lane (the flagship kernel body's input; see
    ops/vote_lanes.py) — when body='packed4' (default), else
    (D, S, B*r_sub, tile_w) uint8 rows.  Counts are psum-exact: any
    event->data split is bitwise equivalent (integer adds commute), so
    events are split round-robin like bucket_events_for_mesh.
    """
    from polypolish_tpu.ops import vote_lanes

    r_sub = r_sub or vote_lanes.R_SUB
    tile_w = tile_w or vote_lanes.TILE_W
    if body == "packed4":
        assert r_sub % 4 == 0

    mask = (vocab >= 0) & (vocab < DENSE_V) & (pos >= 0) & (pos < num_positions)
    pos = np.asarray(pos[mask], dtype=np.int64)
    vocab = np.asarray(vocab[mask], dtype=np.uint8)

    p_shard = -(-num_positions // n_pos)
    p_shard = max(tile_w, -(-p_shard // tile_w) * tile_w)
    n_tiles = p_shard // tile_w
    p_total = p_shard * n_pos
    tiles_total = n_tiles * n_pos
    data_of = np.arange(pos.size, dtype=np.int64) % n_data

    # depth per (data slice, global position) in one bincount
    depth = np.bincount(
        data_of * p_total + pos, minlength=n_data * p_total
    ).reshape(n_data, p_total)
    # rows per (d, global tile): tile-max depth rounded up to r_sub
    rows_per = np.maximum(
        r_sub,
        -(-depth.reshape(n_data, tiles_total, tile_w).max(axis=2)
          // r_sub) * r_sub,
    ).astype(np.int64)
    blocks_per = rows_per // r_sub                      # (D, tiles_total)
    blocks_per_shard = blocks_per.reshape(
        n_data, n_pos, n_tiles
    ).sum(axis=2)                                       # (D, S)
    # common padded block count B (geometric + slab, matching
    # vote_lanes._pad_block_count semantics on the max shard)
    b = vote_lanes.geom_pad(int(blocks_per_shard.max()),
                            slab=vote_lanes.MAX_BLOCKS_PER_CALL)

    # block_tile: per (d, s) the local tile index of each emitted block,
    # padded with n_tiles-1 (all vectorised via repeat + group offsets)
    bt_all = np.full((n_data, n_pos, b), n_tiles - 1, dtype=np.int32)
    tile_vals = np.tile(np.arange(n_tiles, dtype=np.int32),
                        n_data * n_pos)
    emitted_tile = np.repeat(tile_vals, blocks_per.reshape(-1))
    shard_starts = np.concatenate(
        ([0], np.cumsum(blocks_per_shard.reshape(-1)))
    )
    shard_of_block = np.repeat(
        np.arange(n_data * n_pos), blocks_per_shard.reshape(-1)
    )
    within = np.arange(emitted_tile.size) - shard_starts[shard_of_block]
    bt_all.reshape(-1)[shard_of_block * b + within] = emitted_tile

    # row base of each (d, global tile) within its shard buffer
    rows_ds = rows_per.reshape(n_data, n_pos, n_tiles)
    row_base = (np.cumsum(rows_ds, axis=2) - rows_ds).reshape(
        n_data, tiles_total
    )

    # occurrence index per (d, global position) via one stable sort
    key = data_of * p_total + pos
    order = np.argsort(key, kind="stable")
    skey = key[order]
    key_start = np.concatenate(([0], np.cumsum(depth.reshape(-1))))
    occ = np.arange(skey.size, dtype=np.int64) - key_start[skey]

    d_s = data_of[order]
    gpos = pos[order]
    tile_g = gpos // tile_w
    col = gpos - tile_g * tile_w
    shard = tile_g // n_tiles
    row = row_base[d_s, tile_g] + occ
    shard_bytes = b * r_sub * tile_w
    base = (d_s * n_pos + shard) * shard_bytes
    vb_flat = np.full(n_data * n_pos * shard_bytes, vote_lanes.PAD_BYTE,
                      dtype=np.uint8)
    if body == "packed4":
        # scatter straight into the packed4 byte addressing (four
        # byte-rows per int32 lane), no re-layout pass
        byte_idx = base + (row >> 2) * (tile_w * 4) + col * 4 + (row & 3)
        vb_flat[byte_idx] = vocab[order]
        vb_all = vb_flat.view(np.int32).reshape(
            n_data, n_pos, b * (r_sub // 4), tile_w
        )
    else:
        vb_flat[base + row * tile_w + col] = vocab[order]
        vb_all = vb_flat.reshape(n_data, n_pos, b * r_sub, tile_w)
    return vb_all, bt_all, p_shard, n_tiles


def make_sharded_polish_step_lanes(
    mesh: Mesh, p_shard: int, n_tiles: int,
    r_sub: Optional[int] = None, tile_w: Optional[int] = None,
    interpret: Optional[bool] = None,
    body: str = "packed4",
):
    """SPMD step with the lane-aligned VPU vote kernel per shard (the
    round-3 flagship multi-chip path).  Same contract as
    make_sharded_polish_step but events arrive as lane-packed byte
    blocks (see bucket_lanes_for_mesh): each device runs the lanes
    kernel on its block slab, counts psum over 'data', consensus per
    position shard."""
    from polypolish_tpu.ops import vote_lanes

    r_sub = r_sub or vote_lanes.R_SUB
    tile_w = tile_w or vote_lanes.TILE_W
    if interpret is None:
        interpret = vote_lanes._default_interpret()

    def local_step(vb, block_tile,
                   valid_thr, invalid_thr, low_depth, orig_id):
        counts = vote_lanes._lanes_call(
            vb.reshape(-1, tile_w),
            block_tile.reshape(-1),
            n_tiles=n_tiles, interpret=interpret,
            r_sub=r_sub, tile_w=tile_w, body=body,
        )[:, :p_shard]
        counts = jax.lax.psum(counts, "data")
        new_id, status = consensus_dense_core(
            counts, valid_thr, invalid_thr, low_depth, orig_id
        )
        return counts, new_id, status

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P("data", "pos", None, None),
            P("data", "pos", None),
            P("pos"), P("pos"), P("pos"), P("pos"),
        ),
        out_specs=(P(None, "pos"), P("pos"), P("pos")),
        # pallas_call's out_shape carries no varying-mesh-axes info, so
        # the vma checker cannot see through it; correctness is covered
        # by the bitwise single-device equality tests
        check_vma=False,
    )
    return jax.jit(sharded)


_STEP_CACHE: dict = {}


def get_sharded_polish_step_lanes(
    mesh: Mesh, p_shard: int, n_tiles: int,
    r_sub: Optional[int] = None, tile_w: Optional[int] = None,
    interpret: Optional[bool] = None,
    body: str = "packed4",
):
    """Cached make_sharded_polish_step_lanes: repeated contigs/genomes
    with the same shard geometry reuse one jitted SPMD step instead of
    re-tracing (jax.jit caches per function object, so the builder must
    be memoised for the cache to hit)."""
    from polypolish_tpu.ops import vote_lanes

    r_sub = r_sub or vote_lanes.R_SUB
    tile_w = tile_w or vote_lanes.TILE_W
    if interpret is None:
        interpret = vote_lanes._default_interpret()
    key = (mesh, p_shard, n_tiles, r_sub, tile_w, interpret, body)
    step = _STEP_CACHE.get(key)
    if step is None:
        step = make_sharded_polish_step_lanes(
            mesh, p_shard, n_tiles, r_sub=r_sub, tile_w=tile_w,
            interpret=interpret, body=body,
        )
        _STEP_CACHE[key] = step
    return step


def sharded_vote_consensus_lanes(
    mesh: Mesh,
    pos: np.ndarray,
    vocab: np.ndarray,
    num_positions: int,
    valid_thr: np.ndarray,
    invalid_thr: np.ndarray,
    low_depth: np.ndarray,
    orig_id: np.ndarray,
    interpret: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Like sharded_vote_consensus, but each shard votes through the
    lane-aligned VPU kernel (the round-3 flagship multi-chip path)."""
    import jax.numpy as jnp

    n_data, n_pos = mesh.devices.shape
    vb, bt, p_shard, n_tiles = bucket_lanes_for_mesh(
        pos, vocab, num_positions, n_data, n_pos
    )
    p_total = p_shard * n_pos

    def pad_p(arr, fill):
        out = np.full(p_total, fill, dtype=arr.dtype)
        out[: arr.shape[0]] = arr
        return out

    step = get_sharded_polish_step_lanes(mesh, p_shard, n_tiles,
                                         interpret=interpret)
    counts, new_id, status = step(
        jnp.asarray(vb), jnp.asarray(bt),
        jnp.asarray(pad_p(np.asarray(valid_thr, np.int32), 2**31 - 1)),
        jnp.asarray(pad_p(np.asarray(invalid_thr, np.int32), 2**31 - 1)),
        jnp.asarray(pad_p(np.asarray(low_depth, bool), True)),
        jnp.asarray(pad_p(np.asarray(orig_id, np.int32), 0)),
    )
    return (
        np.array(counts)[:, :num_positions],
        np.array(new_id)[:num_positions],
        np.array(status)[:num_positions],
    )
