"""Build/locate the single-threaded reference-replica binary (ppref).

ppref (ref_replica.cc) mirrors the Rust reference's polish subcommand
structure-for-structure; it is the MEASURED single-core performance
baseline for bench.py and a differential oracle for tests (its stdout
FASTA and --debug TSV must be byte-identical to the framework's).
"""

from __future__ import annotations

import os
import subprocess
import threading
from typing import List, Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ref_replica.cc")
_BIN = os.path.join(_HERE, "ppref")

_lock = threading.Lock()
_build_failed = False


def build() -> Optional[str]:
    """Compile ppref if missing/stale; returns the binary path or None."""
    global _build_failed
    with _lock:
        if _build_failed:
            return None
        try:
            src_mtime = os.path.getmtime(_SRC)
            if (os.path.exists(_BIN)
                    and os.path.getmtime(_BIN) >= src_mtime):
                return _BIN
            # plain -O2, no -march=native: the replica stands in for the
            # reference built with a stock `cargo build --release`
            cmd = ["g++", "-O2", "-std=c++17", _SRC, "-o", _BIN + ".tmp"]
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
            os.replace(_BIN + ".tmp", _BIN)
            return _BIN
        except Exception:
            _build_failed = True
            return None


def run_polish(
    assembly: str,
    sams: List[str],
    debug: Optional[str] = None,
    fraction_invalid: float = 0.2,
    fraction_valid: float = 0.5,
    max_errors: int = 10,
    min_depth: int = 5,
    careful: bool = False,
) -> "subprocess.CompletedProcess[bytes]":
    """Run `ppref polish` and return the completed process (stdout =
    polished FASTA bytes, stderr includes a PPREF_TIMING line)."""
    binary = build()
    if binary is None:
        raise RuntimeError("ppref build failed (g++ unavailable?)")
    cmd = [binary, "polish", "-i", repr(fraction_invalid),
           "-v", repr(fraction_valid), "-m", str(max_errors),
           "-d", str(min_depth)]
    if careful:
        cmd.append("--careful")
    if debug is not None:
        cmd += ["--debug", debug]
    cmd.append(assembly)
    cmd.extend(sams)
    return subprocess.run(cmd, capture_output=True, check=False)


def parse_timing(stderr: bytes) -> dict:
    """Extract the PPREF_TIMING key=val line into a float dict."""
    out = {}
    for line in stderr.decode("utf-8", errors="replace").splitlines():
        if line.startswith("PPREF_TIMING "):
            for kv in line.split()[1:]:
                k, _, v = kv.partition("=")
                out[k] = float(v)
    return out
