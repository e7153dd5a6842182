"""Ports of filter.rs tests (filter.rs:380-479) + vectorised equivalence."""

import numpy as np
import pytest

from polypolish_tpu.errors import PolypolishError
from polypolish_tpu.io.sam import parse_alignment_quick
from polypolish_tpu.ops import pairfilter
from polypolish_tpu.ops.pairfilter import (
    ORIENTATION_NAMES,
    auto_determine_orientation,
    get_percentile,
    get_percentile_name,
    insert_size_scalar,
    orientation_scalar,
)


def run_get_orientation(pos_1, pos_2, strand_1, strand_2):
    s1 = f"r_1\t{strand_1}\tx\t{pos_1}\t60\t150M\t*\t0\t0\tACTG\tKKKK\tNM:i:0"
    s2 = f"r_2\t{strand_2}\tx\t{pos_2}\t60\t150M\t*\t0\t0\tACTG\tKKKK\tNM:i:0"
    a1 = parse_alignment_quick(s1)
    a2 = parse_alignment_quick(s2)
    code = orientation_scalar(
        a1.sam_flags, a1.ref_start, a1.get_ref_end(),
        a2.sam_flags, a2.ref_start, a2.get_ref_end(),
    )
    return ORIENTATION_NAMES[code]


def test_get_orientation():
    # 1------>            <------2
    assert run_get_orientation(100000, 200000, 0, 16) == "fr"
    # 2------>            <------1
    assert run_get_orientation(200000, 100000, 16, 0) == "fr"
    #            1------>
    # <------2
    assert run_get_orientation(200000, 100000, 0, 16) == "rf"
    # <------1
    #            2------>
    assert run_get_orientation(100000, 200000, 16, 0) == "rf"
    # 1------>   2------>
    assert run_get_orientation(100000, 200000, 0, 0) == "ff"
    # <------2   <------1
    assert run_get_orientation(200000, 100000, 16, 16) == "ff"
    # 2------>   1------>
    assert run_get_orientation(200000, 100000, 0, 0) == "rr"
    # <------1   <------2
    assert run_get_orientation(100000, 200000, 16, 16) == "rr"


def test_auto_determine_orientation():
    assert auto_determine_orientation([3, 1, 1, 1]) == 0  # fr
    assert auto_determine_orientation([1, 3, 1, 1]) == 1  # rf
    assert auto_determine_orientation([1, 1, 3, 1]) == 2  # ff
    assert auto_determine_orientation([1, 1, 1, 3]) == 3  # rr
    with pytest.raises(PolypolishError, match="could not automatically"):
        auto_determine_orientation([2, 2, 1, 1])


def test_get_percentile():
    nums = np.array([15, 20, 35, 40, 50])
    assert get_percentile(nums, 0.1) == 15
    assert get_percentile(nums, 19.9) == 15
    assert get_percentile(nums, 20.1) == 20
    assert get_percentile(nums, 39.9) == 20
    assert get_percentile(nums, 40.1) == 35
    assert get_percentile(nums, 59.9) == 35
    assert get_percentile(nums, 60.1) == 40
    assert get_percentile(nums, 79.9) == 40
    assert get_percentile(nums, 80.1) == 50
    assert get_percentile(nums, 99.9) == 50
    assert get_percentile(np.array([], dtype=np.int64), 50.0) == 0


def test_get_percentile_name():
    assert get_percentile_name(1.0) == "1st percentile"
    assert get_percentile_name(2.0) == "2nd percentile"
    assert get_percentile_name(3.0) == "3rd percentile"
    assert get_percentile_name(4.0) == "4th percentile"
    assert get_percentile_name(5.0) == "5th percentile"
    assert get_percentile_name(6.0) == "6th percentile"
    assert get_percentile_name(7.0) == "7th percentile"
    assert get_percentile_name(8.0) == "8th percentile"
    assert get_percentile_name(9.0) == "9th percentile"
    assert get_percentile_name(10.0) == "10th percentile"
    assert get_percentile_name(0.1) == "0.1st percentile"
    assert get_percentile_name(99.9) == "99.9th percentile"


def test_insert_size():
    assert insert_size_scalar(100, 250, 300, 450) == 350
    assert insert_size_scalar(300, 450, 100, 250) == 350
    assert insert_size_scalar(5, 5, 5, 5) == 0


def test_vectorised_matches_scalar():
    rng = np.random.default_rng(7)
    n = 2000
    flags_1 = rng.choice([0, 16, 256, 272], size=n).astype(np.int32)
    flags_2 = rng.choice([0, 16, 256, 272], size=n).astype(np.int32)
    start_1 = rng.integers(0, 100000, size=n)
    start_2 = rng.integers(0, 100000, size=n)
    end_1 = start_1 + rng.integers(50, 300, size=n)
    end_2 = start_2 + rng.integers(50, 300, size=n)

    codes = pairfilter.orientation_vec(flags_1, start_1, end_1, flags_2, start_2, end_2)
    sizes = pairfilter.insert_size_vec(start_1, end_1, start_2, end_2)
    for i in range(n):
        assert codes[i] == orientation_scalar(
            int(flags_1[i]), int(start_1[i]), int(end_1[i]),
            int(flags_2[i]), int(start_2[i]), int(end_2[i]),
        )
        assert sizes[i] == insert_size_scalar(
            int(start_1[i]), int(end_1[i]), int(start_2[i]), int(end_2[i])
        )


def test_good_pair_mask_jax_matches_numpy():
    rng = np.random.default_rng(8)
    n = 512
    ref_a = rng.integers(0, 3, size=n).astype(np.int32)
    ref_p = rng.integers(0, 3, size=n).astype(np.int32)
    flags_a = rng.choice([0, 16], size=n).astype(np.int32)
    flags_p = rng.choice([0, 16], size=n).astype(np.int32)
    start_a = rng.integers(0, 10000, size=n)
    start_p = rng.integers(0, 10000, size=n)
    end_a = start_a + rng.integers(50, 300, size=n)
    end_p = start_p + rng.integers(50, 300, size=n)
    for orient in range(4):
        np_mask = pairfilter.good_pair_mask_numpy(
            ref_a, flags_a, start_a, end_a, ref_p, flags_p, start_p, end_p,
            100, 1000, orient,
        )
        jx_mask = pairfilter.good_pair_mask_jax(
            ref_a, flags_a, start_a, end_a, ref_p, flags_p, start_p, end_p,
            100, 1000, orient,
        )
        np.testing.assert_array_equal(np_mask, jx_mask)


def test_segment_any():
    mask = np.array([False, True, False, False, True, False])
    seg = np.array([0, 0, 1, 2, 2, 2])
    out = pairfilter.segment_any(mask, seg, 4)
    np.testing.assert_array_equal(out, [True, False, True, False])
