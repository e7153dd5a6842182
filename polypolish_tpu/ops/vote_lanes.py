"""Lane-aligned VPU vote kernel — the fast path for pileup counting.

Replaces the reference's per-base scatter loop (pileup.rs:56-65 /
pileup.rs:189-200).  The round-2 MXU one-hot-matmul kernels
(ops/vote_pallas.py) are limited by a fundamental fact: every vote is a
rank-1 update of the count tile, and the MXU retires at most ~one
128x128 rank-1 update per cycle, capping any matmul formulation at
~1-2 G votes/s regardless of how the one-hots are factored (measured
~0.56 G on v5e).  This kernel removes the one-hot entirely:

  * Host layout ("lanes"): a tile is ``tile_w`` consecutive positions
    (a multiple of 128; default 1024 = 8 VPU vregs wide).  An event at
    position p with dense vocab id v is stored as ONE uint8 (the vocab
    id) at column ``p % tile_w`` of a row owned by tile
    ``p // tile_w``; a position's k-th event goes to the k-th row.
    Empty slots hold 255.  The position one-hot is now *implicit in
    the column index* — no per-event position compares — and the wire
    format is 1 byte/event (+ padding).

  * Kernel: grid over row-blocks of ``r_sub`` rows, pure VPU, no MXU.
    Default body 'packed': each event adds ``1 << 8*(v & 3)`` into one
    of two byte-packed int32 accumulator planes, so the cross-sublane
    reduction handles 2 planes instead of 8 per-vocab masks (the
    reduces were the body's main cost); byte fields are peeled apart
    after the sum (exact — counts <= r_sub <= 255).  Measured on v5e
    (100 M events, depth 50, chained-iteration timing, bitwise-
    checked): 158 G slots/s = **78.5 G votes/s** at tile_w=2048
    (cmp body: 126 G slots/s = 62.7 G votes/s) — ~75x the AVX-512 host
    fold (~1 G votes/s on 2 vCPUs) and ~140x the round-2 MXU kernel
    (0.56 G).  The HBM stream (1 B/slot) uses ~20% of the 819 GB/s
    chip bandwidth, and grid-step overhead (~0.2-0.5 us/step) is
    amortised by the wide tiles.

Counts are exact int32 sums of 0/1 indicators — bitwise identical to
the host fold and the MXU kernels across row order, block size, slab
splits, and device meshes (integer adds commute).

Padding model: slots per tile = tile_w * (max per-position event count
in the tile, rounded up to r_sub, min r_sub).  Sparse-tier events
(vocab >= 8) occupy a slot with byte 255 and contribute nothing (they
are counted host-side, mirroring the reference's HashMap tier) — this
lets the native packer copy run vocab bytes verbatim.  Wider tiles
amortise grid steps but take the max over more positions; r_sub trades
row-rounding waste against step count.  Defaults (tile_w=2048,
r_sub=32) measured best on 50x-coverage-shaped pileups (2.0x padding).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polypolish_tpu.vocab import DENSE_V

TILE_W = 2048  # positions per tile (lane-dim; multiple of 128)
R_SUB = 32  # rows per grid step (>= 32 = native int8 sublane tile)
PAD_BYTE = 255  # empty slot / sparse-tier marker (== native overflow byte)
# SMEM budget for the per-block tile map (see vote_pallas.py): split
# longer block streams into equal slabs of this many blocks.
MAX_BLOCKS_PER_CALL = 32768


def _make_lanes_kernel(r_sub: int, tile_w: int, body: str = "packed"):
    """body='packed' (default): byte-packed carry-save accumulation —
    each event adds ``1 << 8*(v & 3)`` into one of two int32
    accumulator planes (v < 4 / v >= 4); the cross-sublane sum then
    reduces 2 packed planes instead of 8 per-vocab masks and the byte
    fields are peeled apart afterwards (exact: field counts <= r_sub
    <= 255, so no cross-byte carries).  Measured ~1.3x the 'cmp' body
    at r_sub=32 / tile_w=2048 on v5e (172 vs 134 G slots/s — the
    per-vocab cross-sublane reduces were the body's main cost).

    body='cmp': the straightforward 8x (compare + widen + sublane-sum).

    body='packed8' (round 5): NIBBLE-packed input — eight 4-bit fields
    per int32 lane (two events per byte: dense vocab 0-7, pad/sparse
    15), halving the wire format to ~0.5 B/event for upload-bound
    device paths.  Same carry-save accumulation after a 4-bit extract;
    per-event lane-ops match packed4 (each int32 row carries twice the
    events), so the HBM-resident rate is comparable and the win is
    pure transfer volume.

    All bodies are exact integer sums — bitwise interchangeable."""
    assert body in ("packed", "cmp", "packed4", "packed8")
    if body in ("packed", "packed4", "packed8"):
        assert r_sub <= 255, "packed body: byte fields overflow past 255"
    if body == "packed4":
        assert r_sub % 4 == 0
    if body == "packed8":
        assert r_sub % 8 == 0

    def _kernel(tiles_ref, vb_ref, out_ref):
        c = pl.program_id(0)
        prev_tile = tiles_ref[jnp.maximum(c - 1, 0)]
        is_first = jnp.logical_or(c == 0, tiles_ref[c] != prev_tile)

        @pl.when(is_first)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        if body == "packed8":
            # eight 4-bit fields per int32 lane; nibble 15 = pad/sparse.
            # The byte-plane one-hot (1 << 8*(v&3)) is built from
            # CONSTANT i32 selects instead of a data-dependent shift:
            # Mosaic on v5e narrows the nibble dataflow to i8 vectors
            # and cannot lower an i8 shli (the round-2 int8 legalization
            # gap again); the 16777216 constant pins the lanes to i32.
            x = vb_ref[:, :]  # (r_sub//8, tile_w) int32
            lo = jnp.zeros_like(x)
            hi = jnp.zeros_like(x)
            from jax import lax as _lax

            for k in range(8):
                # LOGICAL shifts throughout: Mosaic on v5e narrows this
                # dataflow and cannot legalize a narrow arith.shrsi
                vk = _lax.shift_right_logical(x, 4 * k) & 0xF
                # 1 << 8t via two's-complement masking ONLY (add/sub/
                # and): scalar-scalar selects hit a Mosaic i1-relayout
                # bug on v5e, data-dependent shifts hit the i8 shli
                # gap, and narrow multiplies hit the i8 multiply gap —
                # (0 - bit) is 0 or all-ones, so (0 - bit) & C is 0 or C
                a = vk & 1
                b = _lax.shift_right_logical(vk, 1) & 1
                ab = a & b
                one = (jnp.int32(1)
                       + ((0 - a) & 255)
                       + ((0 - b) & 65535)
                       + ((0 - ab) & 16711425))
                lo = lo + jnp.where(vk < 4, one, 0)
                hi = hi + jnp.where((vk >= 4) & (vk < DENSE_V), one, 0)
            slo = jnp.sum(lo, axis=0, keepdims=True)
            shi = jnp.sum(hi, axis=0, keepdims=True)
            parts = [(slo >> (8 * v)) & 0xFF for v in range(4)]
            parts += [(shi >> (8 * v)) & 0xFF for v in range(4)]
            out_ref[:, :] += jnp.concatenate(parts, axis=0)
            return

        if body == "packed4":
            # input is int32 with FOUR byte-rows packed per lane (host
            # layout: row r -> int32-row r//4, byte r%4), so no i8->i32
            # widen/relayout happens at all — byte extraction is two
            # in-register ops per packed row.  Measured 2.0x the
            # 'packed' body on v5e (326 vs 160 G slots/s).
            x = vb_ref[:, :]  # (r_sub//4, tile_w) int32
            lo = jnp.zeros_like(x)
            hi = jnp.zeros_like(x)
            for k in range(4):
                vk = (x >> (8 * k)) & 0xFF  # pad byte -> 255
                s = (vk & 3) << 3
                one = jnp.left_shift(jnp.int32(1), s)
                lo = lo + jnp.where(vk < 4, one, 0)
                hi = hi + jnp.where((vk >= 4) & (vk < DENSE_V), one, 0)
            slo = jnp.sum(lo, axis=0, keepdims=True)
            shi = jnp.sum(hi, axis=0, keepdims=True)
            parts = [(slo >> (8 * v)) & 0xFF for v in range(4)]
            parts += [(shi >> (8 * v)) & 0xFF for v in range(4)]
            out_ref[:, :] += jnp.concatenate(parts, axis=0)
            return

        # one i8->i32 widen per block: Mosaic on v5e rejects int8
        # equality compares (same legalization gap as the round-2 int8
        # mask multiply, BENCH_NOTES.md), so work in int32
        vb = vb_ref[:, :].astype(jnp.int32)  # (r_sub, tile_w); pad 255==-1
        if body == "packed":
            s = (vb & 3) << 3
            one = jnp.left_shift(jnp.int32(1), s)
            lo = jnp.where((vb >= 0) & (vb < 4), one, 0)
            hi = jnp.where((vb >= 4) & (vb < DENSE_V), one, 0)
            slo = jnp.sum(lo, axis=0, keepdims=True)
            shi = jnp.sum(hi, axis=0, keepdims=True)
            parts = [(slo >> (8 * v)) & 0xFF for v in range(4)]
            parts += [(shi >> (8 * v)) & 0xFF for v in range(4)]
        else:
            parts = []
            for v in range(DENSE_V):
                m = (vb == v).astype(jnp.int32)
                parts.append(jnp.sum(m, axis=0, keepdims=True))
        out_ref[:, :] += jnp.concatenate(parts, axis=0)  # (8, tile_w)

    return _kernel


def _rows_per_block(r_sub: int, body: str) -> int:
    """Array rows per grid block: r_sub byte-rows, except the packed4
    (four byte-rows per int32 row) and packed8 (eight nibble-rows per
    int32 row) layouts."""
    if body == "packed4":
        return r_sub // 4
    if body == "packed8":
        return r_sub // 8
    return r_sub


def _lanes_call_one(vb, block_tile, n_tiles: int, interpret: bool,
                    r_sub: int, tile_w: int, body: str = "packed"):
    rpb = _rows_per_block(r_sub, body)
    n_blocks = vb.shape[0] // rpb
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((rpb, tile_w), lambda c, tiles: (c, 0))],
        out_specs=pl.BlockSpec(
            (DENSE_V, tile_w), lambda c, tiles: (0, tiles[c])
        ),
    )
    return pl.pallas_call(
        _make_lanes_kernel(r_sub, tile_w, body),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((DENSE_V, n_tiles * tile_w),
                                       jnp.int32),
        cost_estimate=pl.CostEstimate(
            # VPU-only: ~DENSE_V compare+reduce lane-ops per slot
            flops=2 * DENSE_V * vb.size,
            bytes_accessed=vb.size + n_tiles * tile_w * DENSE_V * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(block_tile, vb)


def _lanes_call(vb, block_tile, n_tiles: int, interpret: bool,
                r_sub: int = R_SUB, tile_w: int = TILE_W,
                body: str = "packed"):
    """vb: (n_blocks*r_sub, tile_w) int8; block_tile: (n_blocks,) int32.

    Streams longer than MAX_BLOCKS_PER_CALL blocks are processed as
    equal slabs (callers pad to a slab multiple); a tile straddling a
    slab boundary is re-zeroed by the later slab and the partial int32
    outputs are summed — exact, bitwise-equal to a single call."""
    rpb = _rows_per_block(r_sub, body)
    n_blocks = vb.shape[0] // rpb
    if n_blocks > MAX_BLOCKS_PER_CALL:
        assert n_blocks % MAX_BLOCKS_PER_CALL == 0, (
            n_blocks, MAX_BLOCKS_PER_CALL,
        )
        m = MAX_BLOCKS_PER_CALL
        total = None
        for s in range(n_blocks // m):
            bt_slab = block_tile[s * m:(s + 1) * m]
            out = _lanes_call_one(
                vb[s * m * rpb:(s + 1) * m * rpb], bt_slab,
                n_tiles, interpret, r_sub, tile_w, body,
            )
            visited = jnp.zeros((n_tiles,), jnp.int32).at[bt_slab].set(1)
            out = out * jnp.repeat(visited, tile_w)[None, :]
            total = out if total is None else total + out
        return total
    return _lanes_call_one(vb, block_tile, n_tiles, interpret, r_sub,
                           tile_w, body)


_lanes_jit = jax.jit(
    _lanes_call,
    static_argnames=("n_tiles", "interpret", "r_sub", "tile_w", "body"),
)


def geom_pad(n: int, bits: int = 3, minimum: int = 8,
             slab: Optional[int] = None) -> int:
    """Round ``n`` up to a geometric bucket (<= 2^-bits relative
    padding) so jitted shapes are shared across similar sizes; with
    ``slab`` set, sizes past one slab additionally round to a slab
    multiple (the kernel's slab-split contract).  This is THE padding
    formula — every Python site (block counts, overflow lists, position
    buckets, mesh packs) calls it so the compile-cache bucketing can
    never silently diverge; the C++ twins in sam_packer.cc mirror it."""
    n = max(int(n), minimum)
    shift = max(n.bit_length() - 1 - bits, 0)
    step = 1 << shift
    padded = -(-n // step) * step
    if slab is not None and padded > slab:
        padded = -(-padded // slab) * slab
    return padded


def _pad_block_count(vb: np.ndarray, block_tile: np.ndarray, n_tiles: int,
                     r_sub: int, tile_w: int
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Geometric block-count padding (shared compile shapes) + slab
    rounding, mirroring vote_pallas._pad_chunk_count.  Pad blocks are
    all-255 rows mapped to the last tile."""
    n_blocks = block_tile.shape[0]
    padded = geom_pad(n_blocks, slab=MAX_BLOCKS_PER_CALL)
    if padded == n_blocks:
        return vb, block_tile
    extra = padded - n_blocks
    pad_vb = np.full((extra * r_sub, tile_w), PAD_BYTE, dtype=np.uint8)
    pad_tile = np.full(extra, n_tiles - 1, dtype=np.int32)
    return (np.concatenate([vb, pad_vb]),
            np.concatenate([block_tile, pad_tile]))


# Cost weight of routing one event through the overflow scatter-add
# instead of a lane slot, in slot-equivalents (upload is 5 B/event vs
# 1 B/slot, plus the XLA scatter's per-event gather/update cost).  Used
# by the depth-stratified row-cap policy below; the policy is a pure
# function of the per-tile depth HISTOGRAM, so the native packer
# (sam_packer.cc pick_capped_rows) reproduces it exactly and both
# packers emit identical block streams.
OVERFLOW_WEIGHT = 64


def choose_rows_per_tile(
    depth: np.ndarray, n_tiles: int, tile_w: int, r_sub: int,
    cap: bool = False,
) -> np.ndarray:
    """Rows allocated per tile.  cap=False: ceil(max_depth/r_sub)*r_sub
    (the round-3 exact-max layout).  cap=True: depth-stratified — per
    tile, choose the row count C (multiple of r_sub) minimising
    C*tile_w + OVERFLOW_WEIGHT * sum(max(0, d_p - C)); events above C
    at a position take the overflow scatter path instead of a lane
    slot.  Cuts the pad factor from ~2x to ~1.3x at depth 50 (round-3
    verdict item 5: the gap between 292 G slots/s and 145 G votes/s
    was padding, not the kernel body)."""
    d2 = depth.reshape(n_tiles, tile_w)
    max_per_tile = d2.max(axis=1)
    rows = np.maximum(
        r_sub, -(-max_per_tile // r_sub) * r_sub
    ).astype(np.int64)
    if not cap:
        return rows
    for t in np.nonzero(max_per_tile > r_sub)[0]:
        d = np.sort(d2[t])
        total = int(d.sum())
        prefix = np.concatenate(([0], np.cumsum(d)))
        r0 = int(rows[t])
        best_cost = r0 * tile_w  # overflow 0 at the exact max
        best_c = r0
        c = r0 - r_sub
        while c >= r_sub:
            i = int(np.searchsorted(d, c, side="right"))
            m = d.shape[0] - i  # positions with depth > c
            ov = (total - int(prefix[i])) - c * m
            cost = c * tile_w + OVERFLOW_WEIGHT * ov
            if cost < best_cost:
                best_cost = cost
                best_c = c
            c -= r_sub
        rows[t] = best_c
    return rows


def prepare_lanes(
    pos: np.ndarray,
    vocab: np.ndarray,
    num_positions: int,
    r_sub: int = R_SUB,
    tile_w: int = TILE_W,
    cap: bool = False,
):
    """Pack events into the lane-aligned layout (numpy reference packer;
    the native C++ twin is pp_lanes_from_runs, which packs straight from
    the run stream).

    Returns (vb (n_blocks*r_sub, tile_w) uint8, block_tile (n_blocks,)
    int32, n_tiles).  Sparse-tier / out-of-range events are dropped
    (they are counted host-side).  With cap=True the rows per tile are
    depth-stratified (see choose_rows_per_tile) and two extra arrays
    are returned — (ov_pos int32, ov_vid uint8), sorted by (pos, vid) —
    holding the events that must be scatter-added on top of the kernel
    counts.
    """
    assert tile_w % 128 == 0 and r_sub % 8 == 0
    n_tiles = max(1, -(-num_positions // tile_w))
    mask = (vocab >= 0) & (vocab < DENSE_V) & (pos >= 0) & (pos < num_positions)
    pos = np.asarray(pos[mask], dtype=np.int64)
    vocab = np.asarray(vocab[mask], dtype=np.uint8)

    depth = np.bincount(pos, minlength=n_tiles * tile_w).astype(np.int64)
    rows_per_tile = choose_rows_per_tile(
        depth, n_tiles, tile_w, r_sub, cap=cap
    )
    row_base = np.concatenate(([0], np.cumsum(rows_per_tile)))[:-1]
    total_rows = int(rows_per_tile.sum())

    # occurrence index of each event within its position (stable sort);
    # the int32 cast is a measured sort speedup and is safe because the
    # mask above bounds pos < num_positions — guard the precondition so
    # a >2^31-position genome can never silently wrap (ADVICE round 3)
    if num_positions <= 2**31:
        order = np.argsort(pos.astype(np.int32), kind="stable")
    else:  # pragma: no cover - no real genome is this long
        order = np.argsort(pos, kind="stable")
    spos = pos[order]
    pos_start = np.concatenate(([0], np.cumsum(depth)))
    occ = np.arange(spos.size, dtype=np.int64) - pos_start[spos]

    vb = np.full((total_rows, tile_w), PAD_BYTE, dtype=np.uint8)
    tile = spos // tile_w
    svocab = vocab[order]
    if cap:
        keep = occ < rows_per_tile[tile]
        row = row_base[tile[keep]] + occ[keep]
        vb[row, spos[keep] % tile_w] = svocab[keep]
        ovm = ~keep
        ov_pos = spos[ovm].astype(np.int32)
        ov_vid = svocab[ovm]
        o = np.lexsort((ov_vid, ov_pos))  # deterministic (pos, vid)
        ov_pos, ov_vid = ov_pos[o], ov_vid[o]
    else:
        row = row_base[tile] + occ
        vb[row, spos % tile_w] = svocab

    block_tile = np.repeat(
        np.arange(n_tiles, dtype=np.int32),
        (rows_per_tile // r_sub).astype(np.int64),
    )
    vb, block_tile = _pad_block_count(vb, block_tile, n_tiles, r_sub, tile_w)
    if cap:
        return vb, block_tile, n_tiles, ov_pos, ov_vid
    return vb, block_tile, n_tiles


def to_packed8(vb: np.ndarray, r_sub: int) -> np.ndarray:
    """Reorder a (rows, tile_w) uint8 lane buffer into the packed8
    NIBBLE layout: int32 (rows//8, tile_w) with 4-bit field k of each
    lane = row 8q+k (dense vocab 0-7; any byte >= 8 — pad or
    sparse-tier — maps to nibble 15, which the kernel ignores exactly
    like bytes >= 8).  Counts are row-order-invariant, so this is
    bitwise-neutral; the wire format halves to ~0.5 B/event."""
    rows, w = vb.shape
    assert rows % 8 == 0 and r_sub % 8 == 0
    nib = np.where(vb < DENSE_V, vb, 15).astype(np.uint32)
    x = nib.reshape(rows // 8, 8, w)
    out = np.zeros((rows // 8, w), np.uint32)
    for k in range(8):
        out |= x[:, k, :] << np.uint32(4 * k)
    return out.view(np.int32)


def to_packed4(vb: np.ndarray, r_sub: int) -> np.ndarray:
    """Reorder a (rows, tile_w) uint8 lane buffer into the packed4
    layout: int32 (rows//4, tile_w) with byte k of each lane = row
    4q+k (little-endian).  Counts are row-order-invariant, so this is
    bitwise-neutral."""
    rows, w = vb.shape
    assert rows % 4 == 0 and r_sub % 4 == 0
    x = vb.reshape(rows // 4, 4, w).transpose(0, 2, 1)
    return np.ascontiguousarray(x).view(np.int32).reshape(rows // 4, w)


def _default_interpret() -> bool:
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:
        return True


def add_overflow_counts(counts, ov_pos, ov_vid):
    """Scatter-add the depth-stratified overflow events (vocab bytes at
    positions whose depth exceeded the tile's row cap) onto the kernel
    counts.  Exact integer adds — bitwise-equal to having packed them
    into lane slots.  Pad/sparse entries (vid >= 8 or pos >= P) drop."""
    return counts.at[
        jnp.asarray(ov_vid).astype(jnp.int32),
        jnp.asarray(ov_pos).astype(jnp.int32),
    ].add(1, mode="drop")


def dense_counts_lanes(
    pos: np.ndarray,
    vocab: np.ndarray,
    num_positions: int,
    interpret: Optional[bool] = None,
    r_sub: int = R_SUB,
    tile_w: int = TILE_W,
    body: str = "packed",
    cap: bool = False,
) -> jnp.ndarray:
    """(8, P) int32 dense vote counts via the lane-aligned VPU kernel.
    cap=True uses the depth-stratified layout (smaller pad factor) and
    folds the overflow events back in with one scatter-add."""
    if interpret is None:
        interpret = _default_interpret()
    packed = prepare_lanes(
        pos, vocab, num_positions, r_sub, tile_w, cap=cap
    )
    if cap:
        vb, block_tile, n_tiles, ov_pos, ov_vid = packed
    else:
        vb, block_tile, n_tiles = packed
    if body == "packed4":
        arr = to_packed4(vb, r_sub)
    elif body == "packed8":
        arr = to_packed8(vb, r_sub)
    else:
        arr = vb.view(np.int8)
    out = _lanes_jit(
        jnp.asarray(arr), jnp.asarray(block_tile),
        n_tiles=n_tiles, interpret=interpret, r_sub=r_sub, tile_w=tile_w,
        body=body,
    )
    if cap and ov_pos.size:
        out = add_overflow_counts(out, ov_pos, ov_vid)
    return out[:, :num_positions]
