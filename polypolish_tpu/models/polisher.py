"""The flagship device "model": vote accumulation + consensus as one
jittable forward step.

This is the whole device-side compute graph of the polisher: packed
event chunks go in, the (8, P) count tensor plus per-position polishing
decisions come out.  On TPU the vote half runs as the Pallas one-hot-
matmul kernel (ops/vote_pallas.py); elsewhere (CPU tests) it uses the
kernel's interpreter mode or the XLA scatter fallback.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from polypolish_tpu.ops.consensus import consensus_dense_core
from polypolish_tpu.ops.vote_pallas import (
    E_LANE,
    E_SUB,
    TILE_P,
    _vote_pallas_call,
    prepare_chunks,
)
from polypolish_tpu.vocab import DENSE_V


class PolisherModel:
    """Jittable forward step over a fixed contig length.

    forward(chunk_pos, chunk_vocab, chunk_tile,
            valid_thr, invalid_thr, low_depth, orig_id)
      -> (counts (8, P), new_id (P,), status (P,))
    """

    def __init__(
        self,
        num_positions: int,
        use_pallas: bool = True,
        interpret: Optional[bool] = None,
    ) -> None:
        from polypolish_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        self.num_positions = num_positions
        self.n_tiles = max(1, -(-num_positions // TILE_P))
        self.use_pallas = use_pallas
        if interpret is None:
            try:
                interpret = jax.default_backend() not in ("tpu", "axon")
            except Exception:
                interpret = True
        self.interpret = interpret
        self.forward_jit = jax.jit(self.forward)

    def forward(
        self, chunk_pos, chunk_vocab, chunk_tile,
        valid_thr, invalid_thr, low_depth, orig_id,
    ):
        # pack() ships compact dtypes (int16 tile-local positions, int8
        # vocab ids) to cut host->device transfer ~2.7x; the widening to
        # the kernel's int32 contract runs on device inside this jit
        if chunk_pos.dtype != jnp.int32:
            chunk_pos = chunk_pos.astype(jnp.int32)
        if chunk_vocab.dtype != jnp.int32:
            chunk_vocab = chunk_vocab.astype(jnp.int32)
        if self.use_pallas:
            counts = _vote_pallas_call(
                chunk_pos, chunk_vocab, chunk_tile,
                n_tiles=self.n_tiles, interpret=self.interpret,
            )[:, : self.num_positions]
        else:
            pos = chunk_pos.reshape(-1)
            voc = chunk_vocab.reshape(-1)
            tile = jnp.repeat(chunk_tile, E_SUB * E_LANE)
            gpos = jnp.where(
                pos >= 0, tile * TILE_P + pos, self.num_positions
            ).astype(jnp.int32)
            counts = (
                jnp.zeros((DENSE_V, self.num_positions), jnp.int32)
                .at[voc, gpos]
                .add(1, mode="drop")
            )
        new_id, status = consensus_dense_core(
            counts, valid_thr, invalid_thr, low_depth, orig_id
        )
        return counts, new_id, status

    def pack(self, pos: np.ndarray, vocab: np.ndarray):
        """Host packing: event arrays -> device chunk tensors.

        Tile-local positions fit int16 (tile_p <= 32767; -1 = pad) and
        dense vocab ids fit int8, so the upload is 3 bytes/event instead
        of 8; forward() widens on device."""
        chunk_pos, chunk_vocab, chunk_tile, n_tiles = prepare_chunks(
            pos, vocab, self.num_positions
        )
        assert n_tiles == self.n_tiles
        return (
            jnp.asarray(chunk_pos.astype(np.int16)),
            jnp.asarray(chunk_vocab.astype(np.int8)),
            jnp.asarray(chunk_tile),
        )


def example_inputs(
    num_positions: int = 4096, n_events: int = 100_000, seed: int = 0
):
    """Realistic small example batch for compile checks and benches."""
    rng = np.random.default_rng(seed)
    model = PolisherModel(num_positions)
    pos = rng.integers(0, num_positions, size=n_events).astype(np.int64)
    vocab = rng.integers(0, DENSE_V, size=n_events).astype(np.int32)
    chunk_pos, chunk_vocab, chunk_tile = model.pack(pos, vocab)
    depth = np.bincount(pos, minlength=num_positions).astype(np.float64)
    valid_thr = np.maximum(5, (depth * 0.5).round()).astype(np.int32)
    invalid_thr = (depth * 0.2).round().astype(np.int32)
    low_depth = depth < 5
    orig_id = rng.integers(1, 5, size=num_positions).astype(np.int32)
    args = (
        chunk_pos, chunk_vocab, chunk_tile,
        jnp.asarray(valid_thr), jnp.asarray(invalid_thr),
        jnp.asarray(low_depth), jnp.asarray(orig_id),
    )
    return model, args


class LanesPolisher:
    """Device polisher fed by the lane-aligned VPU vote kernel
    (ops/vote_lanes.py) — the round-3 flagship device path.

    forward_pack(vb, block_tile, valid_thr, invalid_thr, low_depth,
    orig_id) -> (counts (8, P) device, new_id (P,), status (P,)).

    Slab streams (> MAX_BLOCKS_PER_CALL blocks) are uploaded slab by
    slab with ``jax.device_put`` and the per-slab kernels launched as
    each upload is issued, so transfers overlap compute (polish.rs:26-38
    scope; fixes the serial slab loop flagged in round 2).  All slabs
    share one compiled shape.
    """

    def __init__(self, num_positions: int, r_sub: Optional[int] = None,
                 tile_w: Optional[int] = None,
                 interpret: Optional[bool] = None,
                 body: str = "packed4") -> None:
        from polypolish_tpu.ops.vote_lanes import (
            MAX_BLOCKS_PER_CALL,
            R_SUB,
            TILE_W,
            _lanes_call_one,
        )
        from polypolish_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache()
        self.num_positions = num_positions
        self.r_sub = R_SUB if r_sub is None else r_sub
        self.tile_w = TILE_W if tile_w is None else tile_w
        self.body = body
        if body == "packed4" and self.r_sub % 4:
            self.body = body = "packed"
        self.rows_per_block = (self.r_sub // 4 if body == "packed4"
                               else self.r_sub)
        self.n_tiles = max(1, -(-num_positions // self.tile_w))
        self.max_blocks = MAX_BLOCKS_PER_CALL
        if interpret is None:
            try:
                interpret = jax.default_backend() not in ("tpu", "axon")
            except Exception:
                interpret = True
        self.interpret = interpret

        r_sub_, tile_w_, n_tiles_ = self.r_sub, self.tile_w, self.n_tiles
        interpret_, body_ = self.interpret, self.body

        @jax.jit
        def _slab(vb, block_tile):
            out = _lanes_call_one(
                vb, block_tile, n_tiles_, interpret_, r_sub_, tile_w_,
                body_,
            )
            visited = (
                jnp.zeros((n_tiles_,), jnp.int32).at[block_tile].set(1)
            )
            return out * jnp.repeat(visited, tile_w_)[None, :]

        @jax.jit
        def _single(vb, block_tile):
            return _lanes_call_one(
                vb, block_tile, n_tiles_, interpret_, r_sub_, tile_w_,
                body_,
            )

        @jax.jit
        def _add(a, b):
            return a + b

        @jax.jit
        def _ov_add(counts, ov_pos, ov_vid):
            # depth-stratified overflow events (cap layout): exact
            # integer scatter-add on top of the kernel counts.  Pad and
            # sparse-tier entries (pos >= width or vid >= 8) drop.
            return counts.at[
                ov_vid.astype(jnp.int32), ov_pos.astype(jnp.int32)
            ].add(1, mode="drop")

        @jax.jit
        def _finish(counts, valid_thr, invalid_thr, low_depth, orig_id):
            from polypolish_tpu.ops.consensus import (
                ST_CHANGED,
                consensus_dense_core,
            )

            c = counts[:, : self.num_positions]
            new_id, status = consensus_dense_core(
                c, valid_thr, invalid_thr, low_depth, orig_id
            )
            # compact fetch: status < 6 always fits uint8, and new_id
            # differs from orig_id only at CHANGED positions, where the
            # adopted id is a dense id < 8 — so ship (adopted, status)
            # as uint8 (8x smaller device->host transfer) and let the
            # host reconstruct new_id from its own orig_id (which may
            # hold interned ids >= 256 for odd assembly chars).
            adopted = jnp.where(status == ST_CHANGED, new_id, 0)
            return c, adopted.astype(jnp.uint8), status.astype(jnp.uint8)

        self._slab_jit = _slab
        self._single_jit = _single
        self._add_jit = _add
        self._ov_add_jit = _ov_add
        self._finish_jit = _finish

    def vote_counts(self, vb: np.ndarray, block_tile: np.ndarray,
                    ov_pos=None, ov_vid=None):
        """(8, n_tiles*tile_w) int32 device counts from a host pack.
        Slab uploads are issued back-to-back with the kernel launches —
        jax's async dispatch overlaps slab s+1's transfer with slab s's
        compute.  ``vb`` is the pack's native array: int32 packed4 rows
        for body='packed4' (uint8 row buffers are transformed here),
        int8/uint8 rows otherwise."""
        from polypolish_tpu.ops.vote_lanes import to_packed4

        if self.body == "packed4":
            if vb.dtype == np.uint8:
                vb = to_packed4(vb, self.r_sub)
            assert vb.dtype == np.int32
        else:
            vb = vb.view(np.int8)
        rpb = self.rows_per_block
        n_blocks = vb.shape[0] // rpb
        if n_blocks <= self.max_blocks:
            total = self._single_jit(
                jax.device_put(vb), jax.device_put(block_tile)
            )
        else:
            assert n_blocks % self.max_blocks == 0, (
                n_blocks, self.max_blocks,
            )
            m = self.max_blocks
            total = None
            for s in range(n_blocks // m):
                d_vb = jax.device_put(vb[s * m * rpb:(s + 1) * m * rpb])
                d_bt = jax.device_put(block_tile[s * m:(s + 1) * m])
                part = self._slab_jit(d_vb, d_bt)
                total = part if total is None else self._add_jit(total, part)
        if ov_pos is not None and len(ov_pos):
            if self._ov_mode() == "mxu":
                # Pallas-native overflow (round 5): the sorted-COO
                # overflow list rides the MXU chunks kernel and is
                # added tensor-to-tensor — measured 173 G votes/s for
                # the whole capped pileup vs 56 G with the XLA scatter
                # (and 144 G uncapped), because the ~8 ns/event scatter
                # tax goes away while the 1.34x pad layout stays.
                # Bitwise-identical to the scatter (integer adds).
                from polypolish_tpu.ops.vote_pallas import (
                    _vote_pallas_jit,
                    prepare_chunks,
                )

                P_pad = self.n_tiles * self.tile_w
                cp, cv, ct, mxu_tiles = prepare_chunks(
                    np.asarray(ov_pos, dtype=np.int64),
                    np.asarray(ov_vid, dtype=np.int32), P_pad,
                )
                # the JITTED wrapper: the geometric chunk-shape
                # bucketing shares compiles across contigs/windows —
                # the eager call re-traced the Pallas kernel every time
                # (measured 276x slower per call)
                extra = _vote_pallas_jit(
                    jax.device_put(cp), jax.device_put(cv),
                    jax.device_put(ct), n_tiles=mxu_tiles,
                    interpret=self.interpret,
                )
                total = self._add_jit(total, extra[:, :P_pad])
            else:
                op, ov = self._pad_overflow(ov_pos, ov_vid)
                total = self._ov_add_jit(
                    total, jax.device_put(op), jax.device_put(ov)
                )
        return total

    def _ov_mode(self) -> str:
        """Overflow mechanism: 'mxu' (default on real chips) or
        'scatter'.  POLYPOLISH_TPU_OV_MODE overrides; interpret mode
        defaults to the scatter (the emulated MXU kernel is slow on
        CPU and the results are bitwise-identical either way)."""
        import os

        v = os.environ.get("POLYPOLISH_TPU_OV_MODE")
        if v in ("mxu", "scatter"):
            return v
        return "scatter" if self.interpret else "mxu"

    def _pad_overflow(self, ov_pos, ov_vid):
        """Geometric-bucket padding of the overflow arrays so repeated
        contigs share one compiled scatter shape (pad position = the
        counts width, which mode='drop' discards)."""
        from polypolish_tpu.ops.vote_lanes import geom_pad

        padded = geom_pad(len(ov_pos))
        op = np.full(padded, self.n_tiles * self.tile_w, dtype=np.int32)
        ov = np.zeros(padded, dtype=np.uint8)
        op[:len(ov_pos)] = ov_pos
        ov[:len(ov_vid)] = ov_vid
        return op, ov

    def forward_pack(self, vb, block_tile, valid_thr, invalid_thr,
                     low_depth, orig_id, ov_pos=None, ov_vid=None):
        counts = self.vote_counts(vb, block_tile, ov_pos, ov_vid)
        return self._finish_jit(
            counts, valid_thr, invalid_thr, low_depth, orig_id
        )
