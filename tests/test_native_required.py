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
