"""Aux subsystem unit tests: profiling, compile cache, multihost, log."""

import os

import pytest

from polypolish_tpu import log
from polypolish_tpu.utils import profiling
from polypolish_tpu.utils.compile_cache import enable_persistent_cache


def test_phase_timers():
    profiling.reset_timings()
    with profiling.phase("alpha"):
        pass
    with profiling.phase("alpha"):
        pass
    with profiling.phase("beta"):
        pass
    t = profiling.timings()
    assert set(t) == {"alpha", "beta"}
    assert t["alpha"] >= 0.0


def test_maybe_trace_noop(monkeypatch):
    monkeypatch.delenv("POLYPOLISH_TPU_PROFILE", raising=False)
    with profiling.maybe_trace():
        pass


def test_enable_persistent_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("POLYPOLISH_TPU_CACHE_DIR", str(tmp_path / "c"))
    import polypolish_tpu.utils.compile_cache as cc

    monkeypatch.setattr(cc, "_DONE", False)
    enable_persistent_cache()
    assert (tmp_path / "c").is_dir()


def test_log_quiet(capsys):
    with log.quiet():
        log.eprint("hidden")
        log.section_header("hidden")
        log.explanation("hidden")
    log.eprint("visible")
    err = capsys.readouterr().err
    assert "hidden" not in err
    assert "visible" in err


def test_multihost_single_host_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    from polypolish_tpu.parallel.multihost import initialize_distributed

    assert initialize_distributed() is False


def test_thousands():
    assert log.thousands(1234567) == "1,234,567"
    assert log.thousands(0) == "0"
