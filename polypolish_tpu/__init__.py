"""polypolish_tpu — a TPU-native short-read assembly polisher.

A from-scratch JAX/XLA/Pallas re-design of the Polypolish method
(reference: rrwick/Polypolish v0.6.1, Rust).  The method: SAM files contain
*all* possible alignment locations per read; a read aligned to k places
contributes fractional depth 1/k at each location; per-base pileups are
built and a position is rewritten only when the pileup *unambiguously*
supports a single sequence.

Architecture (TPU-first, not a translation):

- Host layer (Python + optional C++ via ctypes): streaming SAM/FASTA text
  I/O, read grouping, CIGAR walking, vocab interning, exact f64 depth
  accumulation (order-sensitive arithmetic the reference does serially).
- Device layer (JAX/XLA/Pallas): integer vote accumulation as one-hot
  matmuls on the MXU (exactly associative -> psum-safe), and the
  elementwise consensus pass over the (vocab, position) count tensor.
- Parallel layer: jax.sharding.Mesh with data-parallel event batches
  (psum vote merge) x position-sharded count tensors.
"""

__version__ = "0.5.0"

TOOL_NAME = "Polypolish-TPU"

from polypolish_tpu import errors as errors  # noqa: E402,F401
