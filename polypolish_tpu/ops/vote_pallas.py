"""Pallas TPU kernel for pileup vote accumulation.

Replaces the reference's per-base scatter loop (pileup.rs:56-65 /
pileup.rs:189-200) with a TPU-native design:

  1. Host: dense-tier events (position, vocab_id) are bucketed by
     position tile (tile_p positions per tile) and padded to fixed-size
     chunks of e_sub*128 events.  Pad events zero out one side of the
     one-hot product: position -1 (int16/int32 chunk layout, numpy
     packer) or vocab 255 (uint8 compact layout, pp_chunks_from_runs)
     — either makes the event contribute nothing.  Every tile gets at
     least one chunk so every output block is visited and initialised.
     Each chunk is laid out as an (e_sub, 128) tile — 128 lanes = the
     MXU contraction depth.
  2. Device: grid over chunks.  Each chunk row (128 events) builds two
     one-hot matrices — vocab one-hot A:(8, 128) and local-position
     one-hot B:(128, tile_p) — and accumulates A @ B into the
     (8, tile_p) output tile **on the MXU**.  Scatter-add becomes
     matmul: exactly associative integer arithmetic, so results are
     bitwise identical across chunk order, tiling, and device meshes
     (psum-safe).

The chunk->tile map rides in scalar-prefetch memory so consecutive
chunks of one tile revisit the same output block without HBM traffic
(Pallas keeps the block resident in VMEM until the block index changes).

Counts are exact: per-chunk partial sums are < 2^24 so the f32 MXU path
is integer-exact; accumulation into the int32 output tile is exact.

Tuning knobs (see bench.py --sweep): tile_p trades per-event MXU/VPU
work (8*tile_p MACs per event) against padding waste on shallow
pileups; e_sub trades grid-step overhead against padding waste.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polypolish_tpu.vocab import DENSE_V

# Defaults (tuned on TPU v5e, 50x-coverage-shaped workloads; see
# BENCH_NOTES.md — the sweep favoured tile_p=256, e_sub=8).
TILE_P = 256  # positions per output tile (lane-dim multiple of 128)
E_SUB = 8  # event-tile sublanes per chunk
E_LANE = 128  # event-tile lanes (= MXU contraction depth)
E_B = E_SUB * E_LANE  # events per chunk
# Max chunks per pallas_call: the per-chunk tile map rides in SMEM
# (1 MB total on v5e), so huge chunk streams are split into equal slabs
# of this many chunks; each slab zero-initialises the tiles it visits
# and the slab outputs are summed (exact int32).  32768 * 4 B = 128 KB.
MAX_CHUNKS_PER_CALL = 32768


def _make_vote_kernel(tile_p: int, e_sub: int, mxu_dtype=jnp.float32,
                      rows: Optional[int] = None):
    """mxu_dtype: int8 (default via use_int8=True — measured ~1.2-1.6x
    the f32 path on v5e) or f32; one-hot contractions are exact either
    way (partial sums < 2^24; int32 accumulation).  ``rows`` = event
    rows per grid step (defaults to e_sub; larger values amortise grid
    step overhead over multiple chunks)."""
    if rows is None:
        rows = e_sub

    def _vote_kernel(tiles_ref, pos_ref, vocab_ref, out_ref):
        c = pl.program_id(0)
        prev_tile = tiles_ref[jnp.maximum(c - 1, 0)]
        is_first = jnp.logical_or(c == 0, tiles_ref[c] != prev_tile)

        @pl.when(is_first)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        vrow = jax.lax.broadcasted_iota(jnp.int32, (DENSE_V, E_LANE), 0)
        pcol = jax.lax.broadcasted_iota(jnp.int32, (E_LANE, tile_p), 1)

        acc = jnp.zeros((DENSE_V, tile_p), jnp.int32)
        for sub in range(rows):  # static unroll: one MXU matmul per row
            voc = vocab_ref[sub, :]  # (128,) int32
            pos = pos_ref[sub, :]  # (128,) int32, -1 = padding
            a = (vrow == voc[None, :]).astype(mxu_dtype)  # (8, 128)
            b = (pcol == pos[:, None]).astype(mxu_dtype)  # (128, tile_p)
            if mxu_dtype == jnp.int8:
                acc = acc + jnp.dot(a, b, preferred_element_type=jnp.int32)
            else:
                acc = acc + jnp.dot(
                    a, b, preferred_element_type=jnp.float32
                ).astype(jnp.int32)
        out_ref[:, :] += acc

    return _vote_kernel


def _make_vote_kernel_fused(tile_p: int, e_sub: int, mxu_dtype=jnp.float32,
                            rows: Optional[int] = None):
    """Fused variant: ONE NT dot per grid step with K = rows*128 instead
    of ``rows`` small K=128 dots — amortises MXU pipeline fills at M=8.

    Avoids the Mosaic "unsupported shape cast" that blocks reshaping an
    (e_sub, 128) block to (1, e_b): the per-row one-hot strips are built
    in the native lane layout and concatenated along the LANE axis into
    (8, K) and (tile_p, K), then contracted with an NT dot_general on
    the lane axis of both operands — no in-kernel relayout at all.
    """
    if rows is None:
        rows = e_sub

    def _vote_kernel(tiles_ref, pos_ref, vocab_ref, out_ref):
        c = pl.program_id(0)
        prev_tile = tiles_ref[jnp.maximum(c - 1, 0)]
        is_first = jnp.logical_or(c == 0, tiles_ref[c] != prev_tile)

        @pl.when(is_first)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        vrow = jax.lax.broadcasted_iota(jnp.int32, (DENSE_V, E_LANE), 0)
        prow = jax.lax.broadcasted_iota(jnp.int32, (tile_p, E_LANE), 0)
        a_parts = []
        bt_parts = []
        for sub in range(rows):  # static unroll
            voc = vocab_ref[sub, :]  # (128,) int32
            pos = pos_ref[sub, :]  # (128,) int32, -1 = padding
            a_parts.append((vrow == voc[None, :]).astype(mxu_dtype))
            bt_parts.append((prow == pos[None, :]).astype(mxu_dtype))
        a = jnp.concatenate(a_parts, axis=1)  # (8, rows*128)
        bt = jnp.concatenate(bt_parts, axis=1)  # (tile_p, rows*128)
        d = jax.lax.dot_general(
            a, bt, (((1,), (1,)), ((), ())),
            preferred_element_type=(
                jnp.int32 if mxu_dtype == jnp.int8 else jnp.float32
            ),
        )
        out_ref[:, :] += d.astype(jnp.int32)

    return _vote_kernel


def _make_vote_kernel_split(tile_p: int, e_sub: int, mxu_dtype=jnp.float32,
                            rows: Optional[int] = None):
    """Split-position variant of the fused kernel: the per-event VPU cost
    of building the position one-hot is the kernel's bottleneck (tile_p
    int32 compares per event; the MXU itself is <1% utilised at M=8).
    Decompose pos = hi*128 + lo: build ONE (128, K) one-hot of the low 7
    bits (128 compares/event) and move the high bits into the tiny vocab
    matrix — for each 128-lane output slab h, mask A by (hi == h)
    (~9 ops/event/slab on an (8, K) operand) and take an NT dot against
    the shared low-bit one-hot.  Per-event compares drop from
    8 + tile_p to ~136 + 9*(tile_p/128), nearly flat in tile_p.

    Padding events (pos == -1) have hi == -1 (arithmetic shift), so every
    slab mask zeroes them; their lo one-hot column is masked out via A.
    Counts stay exact int32 — bitwise identical to the other variants.
    """
    if rows is None:
        rows = e_sub
    assert tile_p % E_LANE == 0
    n_hi = tile_p // E_LANE
    lo_shift = E_LANE.bit_length() - 1  # log2(128)

    def _vote_kernel(tiles_ref, pos_ref, vocab_ref, out_ref):
        c = pl.program_id(0)
        prev_tile = tiles_ref[jnp.maximum(c - 1, 0)]
        is_first = jnp.logical_or(c == 0, tiles_ref[c] != prev_tile)

        @pl.when(is_first)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        vrow = jax.lax.broadcasted_iota(jnp.int32, (DENSE_V, E_LANE), 0)
        lrow = jax.lax.broadcasted_iota(jnp.int32, (E_LANE, E_LANE), 0)
        a_parts = []
        b_parts = []
        hi_parts = []
        for sub in range(rows):  # static unroll
            voc = vocab_ref[sub, :]  # (128,) int32
            pos = pos_ref[sub, :]  # (128,) int32, -1 = padding
            lo = jnp.bitwise_and(pos, E_LANE - 1)
            a_parts.append(vrow == voc[None, :])  # bool (8, 128)
            b_parts.append((lrow == lo[None, :]).astype(mxu_dtype))
            hi_parts.append(jnp.right_shift(pos, lo_shift)[None, :])
        a_bool = jnp.concatenate(a_parts, axis=1)  # bool (8, K)
        bt = jnp.concatenate(b_parts, axis=1)  # (128, K)
        hi = jnp.concatenate(hi_parts, axis=1)  # (1, K)
        acc_t = jnp.int32 if mxu_dtype == jnp.int8 else jnp.float32
        slabs = []
        for h in range(n_hi):  # static unroll: one 128-lane slab per dot
            # fuse the slab mask into the boolean before the cast: an
            # int8 vector multiply fails Mosaic legalization on v5e
            a_h = jnp.logical_and(a_bool, hi == h).astype(mxu_dtype)
            d = jax.lax.dot_general(
                a_h, bt, (((1,), (1,)), ((), ())),
                preferred_element_type=acc_t,
            )
            slabs.append(d.astype(jnp.int32))  # (8, 128)
        out_ref[:, :] += jnp.concatenate(slabs, axis=1)

    return _vote_kernel


_KERNEL_MAKERS = {
    "unfused": _make_vote_kernel,
    "fused": _make_vote_kernel_fused,
    "split": _make_vote_kernel_split,
}


def _variant_name(fused) -> str:
    """``fused`` accepts the legacy bools (False/True) or a variant name
    ('unfused' | 'fused' | 'split')."""
    if fused is True:
        return "fused"
    if fused is False:
        return "unfused"
    if fused in _KERNEL_MAKERS:
        return fused
    raise ValueError(f"unknown kernel variant: {fused!r}")


def prepare_chunks(
    pos: np.ndarray,
    vocab: np.ndarray,
    num_positions: int,
    tile_p: int = TILE_P,
    e_sub: int = E_SUB,
    use_native: bool = True,
    chunk_multiple: int = 1,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Bucket dense-tier events by position tile and pad to chunks.

    Returns (chunk_pos (C*e_sub, 128) int32, chunk_vocab likewise,
    chunk_tile (C,) int32, n_tiles).  Uses the C++ counting-sort when
    the native library is available (layout-identical).
    chunk_multiple: round each tile's chunk count up to this multiple
    (required by _vote_pallas_call's chunks_per_step; numpy path only).
    """
    if chunk_multiple > 1:
        use_native = False
    if use_native:
        try:
            from polypolish_tpu.native import binding, loader

            if loader.available():
                return _pad_chunk_count(
                    *binding.prepare_chunks_native(
                        np.ascontiguousarray(pos, dtype=np.int64),
                        np.ascontiguousarray(vocab, dtype=np.int32),
                        num_positions, tile_p, e_sub,
                    ),
                    e_sub=e_sub,
                )
        except Exception:
            pass
    e_b = e_sub * E_LANE
    mask = (vocab >= 0) & (vocab < DENSE_V) & (pos >= 0) & (pos < num_positions)
    pos = np.asarray(pos[mask], dtype=np.int64)
    vocab = np.asarray(vocab[mask], dtype=np.int32)
    n_tiles = max(1, -(-num_positions // tile_p))

    # int32 keys get numpy's radix sort (stable, O(n)); int64 would fall
    # back to a much slower mergesort
    tile32 = (pos // tile_p).astype(np.int32)
    order = np.argsort(tile32, kind="stable")
    pos = pos[order]
    vocab = vocab[order]
    tile = tile32[order].astype(np.int64)

    per_tile = np.bincount(tile, minlength=n_tiles)
    chunks_per_tile = np.maximum(1, -(-per_tile // e_b))
    if chunk_multiple > 1:
        k = chunk_multiple
        chunks_per_tile = (-(-chunks_per_tile // k)) * k
    n_chunks = int(chunks_per_tile.sum())

    flat_pos = np.full(n_chunks * e_b, -1, dtype=np.int32)
    flat_vocab = np.zeros(n_chunks * e_b, dtype=np.int32)
    chunk_tile = np.repeat(np.arange(n_tiles, dtype=np.int32), chunks_per_tile)

    # slot offset of each tile's first chunk, in flattened event slots
    chunk_start = np.concatenate(([0], np.cumsum(chunks_per_tile)))[:-1]
    tile_event_start = np.concatenate(([0], np.cumsum(per_tile)))[:-1]
    within_tile = np.arange(pos.size) - tile_event_start[tile]
    dst = chunk_start[tile] * e_b + within_tile
    flat_pos[dst] = (pos - tile * tile_p).astype(np.int32)
    flat_vocab[dst] = vocab
    chunk_pos = flat_pos.reshape(n_chunks * e_sub, E_LANE)
    chunk_vocab = flat_vocab.reshape(n_chunks * e_sub, E_LANE)
    return _pad_chunk_count(
        chunk_pos, chunk_vocab, chunk_tile, n_tiles, e_sub=e_sub,
        multiple=chunk_multiple,
    )


def _pad_chunk_count(chunk_pos, chunk_vocab, chunk_tile, n_tiles, e_sub,
                     multiple: int = 1):
    """Round the chunk count up to a geometric bucket (<= 12.5% extra)
    so the kernel's jitted shape is shared across event counts instead of
    recompiling per contig/file (compiles cost minutes on some backends).

    Pad chunks carry only pad events (pos -1) and map to the last tile,
    so they re-accumulate zeros and never touch the is_first logic.
    """
    n_chunks = chunk_tile.shape[0]
    n = max(int(n_chunks), 8)
    shift = max(n.bit_length() - 1 - 3, 0)
    step = 1 << shift
    padded = -(-n // step) * step
    if multiple > 1:
        padded = -(-padded // multiple) * multiple
    if padded > MAX_CHUNKS_PER_CALL:
        # big streams are sliced into equal MAX_CHUNKS_PER_CALL slabs
        padded = -(-padded // MAX_CHUNKS_PER_CALL) * MAX_CHUNKS_PER_CALL
    if padded == n_chunks:
        return chunk_pos, chunk_vocab, chunk_tile, n_tiles
    extra = padded - n_chunks
    pad_pos = np.full((extra * e_sub, E_LANE), -1, dtype=np.int32)
    pad_vocab = np.zeros((extra * e_sub, E_LANE), dtype=np.int32)
    pad_tile = np.full(extra, n_tiles - 1, dtype=np.int32)
    return (
        np.concatenate([chunk_pos, pad_pos]),
        np.concatenate([chunk_vocab, pad_vocab]),
        np.concatenate([chunk_tile, pad_tile]),
        n_tiles,
    )


def _vote_pallas_call(
    chunk_pos, chunk_vocab, chunk_tile, n_tiles, interpret,
    tile_p: int = TILE_P, e_sub: int = E_SUB, use_int8: bool = True,
    chunks_per_step: int = 1, fused: Union[bool, str] = "split",
):
    """chunks_per_step > 1 processes k consecutive chunks per grid step
    (the caller must have padded each tile's chunk count to a multiple
    of k so a step never straddles a tile boundary).  fused=True (the
    default — measured ~1.4x the unfused path in same-process A/B on
    v5e, 650 vs 470 M votes/s) uses the single-dot K=e_sub*128 kernel
    (see _make_vote_kernel_fused).

    Streams longer than MAX_CHUNKS_PER_CALL chunks (whose SMEM tile map
    would blow the 1 MB scalar-memory budget) are processed as equal
    slabs — the callers' pad helpers round big streams to a slab
    multiple.  A tile whose chunks straddle a slab boundary is simply
    zero-initialised again by the next slab and the partial outputs are
    summed: exact int32, bitwise-equal to a single call."""
    n_total = chunk_pos.shape[0] // e_sub
    if n_total > MAX_CHUNKS_PER_CALL:
        assert n_total % MAX_CHUNKS_PER_CALL == 0, (
            n_total, MAX_CHUNKS_PER_CALL
        )
        m = MAX_CHUNKS_PER_CALL
        total = None
        for s in range(n_total // m):
            ct_slab = chunk_tile[s * m:(s + 1) * m]
            out = _vote_pallas_call(
                chunk_pos[s * m * e_sub:(s + 1) * m * e_sub],
                chunk_vocab[s * m * e_sub:(s + 1) * m * e_sub],
                ct_slab,
                n_tiles, interpret, tile_p=tile_p, e_sub=e_sub,
                use_int8=use_int8, chunks_per_step=chunks_per_step,
                fused=fused,
            )
            # a slab only initialises the output blocks of tiles it
            # visits; the rest hold garbage — mask them to zero before
            # summing (int32 garbage * 0 == 0, exact)
            visited = jnp.zeros((n_tiles,), jnp.int32).at[ct_slab].set(1)
            out = out * jnp.repeat(visited, tile_p)[None, :]
            total = out if total is None else total + out
        return total
    k = chunks_per_step
    n_chunks = chunk_pos.shape[0] // e_sub
    n_steps = n_chunks // k
    step_tile = chunk_tile[::k] if k > 1 else chunk_tile
    mxu_dtype = jnp.int8 if use_int8 else jnp.float32
    in_block = (e_sub * k, E_LANE)
    make = _KERNEL_MAKERS[_variant_name(fused)]
    kernel = make(tile_p, e_sub, mxu_dtype, rows=e_sub * k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(in_block, lambda c, tiles: (c, 0)),
            pl.BlockSpec(in_block, lambda c, tiles: (c, 0)),
        ],
        out_specs=pl.BlockSpec(
            (DENSE_V, tile_p), lambda c, tiles: (0, tiles[c])
        ),
    )
    flops = 2 * n_chunks * e_sub * DENSE_V * E_LANE * tile_p
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((DENSE_V, n_tiles * tile_p), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * chunk_pos.size * 4 + n_tiles * tile_p * DENSE_V * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(step_tile, chunk_pos, chunk_vocab)


_vote_pallas_jit = jax.jit(
    _vote_pallas_call,
    static_argnames=(
        "n_tiles", "interpret", "tile_p", "e_sub", "use_int8",
        "chunks_per_step", "fused",
    ),
)


def _default_interpret() -> bool:
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:
        return True


def dense_counts_pallas(
    pos: np.ndarray,
    vocab: np.ndarray,
    num_positions: int,
    interpret: Optional[bool] = None,
    tile_p: int = TILE_P,
    e_sub: int = E_SUB,
    use_int8: bool = True,
    fused: Union[bool, str] = "split",
) -> jnp.ndarray:
    """(8, P) int32 dense vote counts via the MXU one-hot-matmul kernel.

    ``fused`` selects the kernel variant: 'split' (low/high position-
    bit decomposition — the default; measured best on v5e, ~560 vs
    ~530/~390 M votes/s in same-process A/B, see BENCH_NOTES.md),
    True/'fused' (single NT dot), or False/'unfused' (per-row dots)."""
    if interpret is None:
        interpret = _default_interpret()
    chunk_pos, chunk_vocab, chunk_tile, n_tiles = prepare_chunks(
        pos, vocab, num_positions, tile_p, e_sub
    )
    out = _vote_pallas_jit(
        jnp.asarray(chunk_pos), jnp.asarray(chunk_vocab),
        jnp.asarray(chunk_tile), n_tiles=n_tiles, interpret=interpret,
        tile_p=tile_p, e_sub=e_sub, use_int8=use_int8, fused=fused,
    )
    return out[:, :num_positions]
