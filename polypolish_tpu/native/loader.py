"""Loader for the native (C++) SAM packer.

The native library is optional; when missing or failing to build the
pure-Python packer in ops/pack.py is used instead.  See sam_packer.cc.
"""

from __future__ import annotations


def available() -> bool:
    try:
        from polypolish_tpu.native import binding

        return binding.load_library() is not None
    except Exception:
        return False


def process_sam_native(filename, votes, vocab, max_errors, careful,
                       n_threads=None):
    from polypolish_tpu.native import binding

    return binding.process_sam_native(
        filename, votes, vocab, max_errors, careful, n_threads=n_threads
    )
