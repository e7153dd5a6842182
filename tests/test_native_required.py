"""CI guard: the native (C++) library must not silently fall back.

All of test_native.py is skipped when ``loader.available()`` is False,
so a broken native build would silently drop that coverage.  CI sets
POLYPOLISH_TPU_REQUIRE_NATIVE=1, turning unavailability into a hard
failure.  (No module-level skip here on purpose.)
"""

import os

from polypolish_tpu.native import loader


def test_native_required_in_ci():
    if os.environ.get("POLYPOLISH_TPU_REQUIRE_NATIVE"):
        assert loader.available(), (
            "POLYPOLISH_TPU_REQUIRE_NATIVE is set but the native library "
            "failed to build/load — native coverage would silently vanish"
        )


def test_native_round3_entry_points_present():
    """A stale cached .so missing the round-3 entry points would make
    binding.load_library() fail its argtypes declarations and silently
    disable ALL native paths — assert the symbols exist whenever the
    library loads at all."""
    if not loader.available():
        return
    from polypolish_tpu.native import binding

    lib = binding.load_library()
    for sym in ("pp_lanes_from_runs", "pp_free_lanes", "pp_lanes_mesh",
                "pp_free_lanes_mesh", "pp_fold_window",
                "pp_sum_f64_seq_init"):
        assert hasattr(lib, sym), sym
