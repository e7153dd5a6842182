"""Test configuration: force a CPU backend with 8 virtual devices so the
multi-device sharding tests run anywhere (SURVEY.md §4 implication).

Note: in this environment the axon TPU plugin overrides the JAX_PLATFORMS
environment variable, so the platform must be forced via jax.config
before any backend is initialised.

Chip sessions (POLYPOLISH_TPU_CHIP_TESTS=1) skip the CPU forcing so the
@pytest.mark.tpu compiled-kernel gate in test_tpu_chip.py runs against
the real attached device; bench.py launches that selection before
capturing kernel numbers.
"""

import os

_CHIP_SESSION = os.environ.get("POLYPOLISH_TPU_CHIP_TESTS") == "1"

_flags = os.environ.get("XLA_FLAGS", "")
if not _CHIP_SESSION and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("POLYPOLISH_TPU_PLAIN_LOG", "1")

import jax  # noqa: E402

if not _CHIP_SESSION:
    jax.config.update("jax_platforms", "cpu")
