"""Device model for the filter pass rule: pair-grid concordance +
segment-any verdict as one jittable step.

The filter workload (filter.rs:352-377) evaluated as a flat
(alignment x pair-alignment) grid: each grid entry checks same-ref,
insert-size window, and orientation; a segment-reduction ORs the grid
back to per-alignment verdicts.  Complements ops/pairfilter.py's
numpy path with a fully fused device graph for large grids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from polypolish_tpu.ops.pairfilter import FF, FR, RF, RR


@functools.partial(jax.jit, static_argnames=("num_alignments",))
def pair_screen_step(
    seg_ids,
    ref_a, flags_a, start_a, end_a,
    ref_p, flags_p, start_p, end_p,
    low, high, correct_orientation,
    no_pair, unique_this,
    num_alignments: int,
):
    """Verdicts for every alignment of one file.

    Grid arrays are flat (one entry per candidate pair), seg_ids maps
    entries to alignment rows (pad entries: seg_id = num_alignments).
    no_pair / unique_this are per-alignment boolean shortcuts
    (filter.rs:362-366).
    """
    fwd_1 = (flags_a & 16) == 0
    fwd_2 = (flags_p & 16) == 0
    pos_1 = jnp.where(fwd_1, start_a, end_a)
    pos_2 = jnp.where(fwd_2, start_p, end_p)
    opp = fwd_1 != fwd_2
    first_fwd = jnp.where(pos_1 < pos_2, fwd_1, fwd_2)
    orient_opp = jnp.where(first_fwd, FR, RF)
    fwd_order = jnp.where(fwd_1, pos_1 < pos_2, pos_2 < pos_1)
    orient_same = jnp.where(fwd_order, FF, RR)
    orient = jnp.where(opp, orient_opp, orient_same)

    hi = jnp.maximum(jnp.maximum(start_a, end_a), jnp.maximum(start_p, end_p))
    lo = jnp.minimum(jnp.minimum(start_a, end_a), jnp.minimum(start_p, end_p))
    insert = hi - lo

    good = (
        (ref_a == ref_p)
        & (low <= insert)
        & (insert <= high)
        & (orient == correct_orientation)
    )
    has_good = (
        jax.ops.segment_max(
            good.astype(jnp.int32), seg_ids,
            num_segments=num_alignments + 1, indices_are_sorted=True,
        )[:num_alignments]
        > 0
    )
    return no_pair | unique_this | has_good
